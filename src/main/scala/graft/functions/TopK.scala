package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** `topK(k)(x)` — approximate k most-frequent values, one pass,
  * mergeable partial states (SURVEY §2.4 G9; the reference delegates
  * the ClickHouse aggregate to chdb, /root/reference/main.py:190).
  *
  * Algorithm: space-saving (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams", ICDT 2005) — the same
  * public algorithm family ClickHouse documents for topK. A bounded
  * map of `capacity = k * loadFactor` counters; when full, the
  * minimum-count entry is evicted and the newcomer inherits min+1 with
  * `error = min`. States merge by summing counts and re-trimming, so
  * the aggregate runs partial/final like any hash aggregate — no
  * global sort, no full distinct materialization: the 100 TB-friendly
  * heavy-hitters path. Exact whenever true cardinality <= capacity.
  *
  * Counters key on the value's string rendering (exact for atomic
  * Catalyst values); eval converts keys back, so the result is an
  * array of the CHILD's type (ClickHouse contract), ordered by
  * descending count with ties broken by key. Unsupported child types
  * degrade to Array(String).
  */
case class TopKSketch(
    child: Expression,
    k: Int,
    weight: Option[Expression] = None,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  private def capacity = math.max(k * 8, 64)

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def prettyName: String =
    if (weight.isDefined) "topKWeighted" else "topK"

  private def typePreserved: Boolean = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | DateType |
         _: TimestampType | _: DecimalType => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(
    if (typePreserved) child.dataType else StringType, containsNull = false)

  /** Inverse of the `toString` used in update() — exact round-trip for
    * the supported atomic Catalyst values. */
  private def fromKey(s: String): Any = child.dataType match {
    case StringType => UTF8String.fromString(s)
    case LongType | _: TimestampType => s.toLong
    case IntegerType | DateType => s.toInt
    case ShortType => s.toShort
    case ByteType => s.toByte
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case BooleanType => s.toBoolean
    case _: DecimalType => org.apache.spark.sql.types.Decimal(s)
    case _ => UTF8String.fromString(s)
  }

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  private def bump(buf: mutable.LinkedHashMap[String, (Long, Long)],
                   v: String, add: Long, err: Long): Unit = {
    buf.get(v) match {
      case Some((c, e)) => buf.update(v, (c + add, e + err))
      case None if buf.size < capacity => buf.update(v, (add, err))
      case None =>
        // evict the minimum-count entry; newcomer inherits its count
        val (minV, (minC, _)) = buf.minBy { case (key, (c, _)) => (c, key) }
        buf.remove(minV)
        buf.update(v, (minC + add, minC + err))
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, (Long, Long)],
                      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      // topKWeighted: each row contributes its weight instead of 1
      // (same space-saving counters — weights are just batched counts)
      val add = weight match {
        case None => 1L
        case Some(w) => w.eval(input) match {
          case null => 0L
          case l: Long => l
          case i: Int => i.toLong
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case d: org.apache.spark.sql.types.Decimal => d.toLong
          case other => other.toString.toDouble.toLong
        }
      }
      if (add > 0L) bump(buf, v.toString, add, 0L)
    }
    buf
  }

  override def merge(buf: mutable.LinkedHashMap[String, (Long, Long)],
                     other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    other.foreach { case (v, (c, e)) => bump(buf, v, c, e) }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (v, (c, _)) => (-c, v) }
      .take(k)
      .map { case (v, _) => fromKey(v) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, (c, e)) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head,
      weight = if (newChildren.size > 1) Some(newChildren(1)) else None)
}
