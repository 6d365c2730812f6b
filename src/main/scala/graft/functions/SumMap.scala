package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** `sumMap(keys, values)` — ClickHouse's per-key array aggregation
  * (the Nested-metrics workhorse: given parallel key/value arrays per
  * row, sums values per key across rows and returns the tuple
  * `(sorted keys, sums)`; reference delegates it to chdb,
  * /root/reference/main.py:190).
  *
  * Mergeable partial states (a plain key→sum map), so it runs
  * partial/final like any hash aggregate — one shuffle on the GROUP BY
  * key, state bounded by per-group key cardinality. Keys round-trip
  * through their string rendering (exact for atomic types, same
  * technique as [[TopKSketch]]); sums are Long for integral value
  * children and Double for fractional ones, matching how ClickHouse
  * widens. Integral sums accumulate in a Long all the way through
  * (ClickHouse sumMap on Int64 is exact beyond 2^53, so a Double
  * intermediate would silently lose precision); the buffer value is
  * `java.lang.Long` when `integralSums` and `java.lang.Double`
  * otherwise, fixed per instance by the input type.
  */
case class SumMapAgg(
    keys: Expression,
    values: Expression,
    op: String = "sum", // sum | min | max (ClickHouse sumMap/minMap/maxMap)
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Any]] {

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false
  override def prettyName: String = s"${op}Map"

  private def combine(a: Any, b: Any): Any =
    if (integralSums) {
      val (x, y) = (a.asInstanceOf[Long], b.asInstanceOf[Long])
      op match {
        case "min" => math.min(x, y)
        case "max" => math.max(x, y)
        case _ => x + y
      }
    } else {
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      op match {
        case "min" => math.min(x, y)
        case "max" => math.max(x, y)
        case _ => x + y
      }
    }

  private def keyType: DataType = keys.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }
  private def integralSums: Boolean = values.dataType match {
    case ArrayType(et, _) => et match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    case _ => false
  }
  private def sumType: DataType = if (integralSums) LongType else DoubleType

  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyType, containsNull = false), nullable = false),
    StructField("sums", ArrayType(sumType, containsNull = false), nullable = false)))

  private def fromKey(s: String): Any = keyType match {
    case StringType => UTF8String.fromString(s)
    case LongType | _: TimestampType => s.toLong
    case IntegerType | DateType => s.toInt
    case ShortType => s.toShort
    case ByteType => s.toByte
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case BooleanType => s.toBoolean
    case _: DecimalType => Decimal(s)
    case _ => UTF8String.fromString(s)
  }

  /** Typed sort order for eval: numeric keys sort numerically. */
  private def keyOrdering: Ordering[String] = keyType match {
    case LongType | IntegerType | ShortType | ByteType |
         DateType | _: TimestampType => Ordering.by((s: String) => s.toLong)
    case DoubleType | FloatType | _: DecimalType =>
      Ordering.by((s: String) => s.toDouble)
    case _ => Ordering.String
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Any] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Any],
                      input: InternalRow): mutable.HashMap[String, Any] = {
    val ks = keys.eval(input).asInstanceOf[ArrayData]
    val vs = values.eval(input).asInstanceOf[ArrayData]
    if (ks == null || vs == null) return buf
    val vt = values.dataType.asInstanceOf[ArrayType].elementType
    val n = math.min(ks.numElements(), vs.numElements())
    var i = 0
    while (i < n) {
      if (!ks.isNullAt(i) && !vs.isNullAt(i)) {
        val k = ks.get(i, keyType).toString
        val v: Any =
          if (integralSums) vs.get(i, vt) match {
            case x: java.lang.Number => x.longValue()
            case other => other.toString.toLong
          }
          else vs.get(i, vt) match {
            case x: java.lang.Number => x.doubleValue()
            case d: Decimal => d.toDouble
            case other => other.toString.toDouble
          }
        buf.update(k, buf.get(k).map(combine(_, v)).getOrElse(v))
      }
      i += 1
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Any],
                     other: mutable.HashMap[String, Any]): mutable.HashMap[String, Any] = {
    other.foreach { case (k, v) =>
      buf.update(k, buf.get(k).map(combine(_, v)).getOrElse(v)) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Any]): Any = {
    val sorted = buf.toSeq.sortBy(_._1)(keyOrdering)
    val ks = new GenericArrayData(sorted.map(e => fromKey(e._1)).toArray[Any])
    val vs = new GenericArrayData(sorted.map(_._2).toArray[Any])
    new GenericInternalRow(Array[Any](ks, vs))
  }

  override def serialize(buf: mutable.HashMap[String, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8 (writeUTF caps at 64 KiB — long keys
    // would crash the partial-aggregate shuffle; same fix as Entropy)
    buf.foreach { case (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      if (integralSums) out.writeLong(v.asInstanceOf[Long])
      else out.writeDouble(v.asInstanceOf[Double])
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Any]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, if (integralSums) in.readLong(): Any else in.readDouble(): Any)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SumMapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumMapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumMapAgg =
    copy(keys = newChildren(0), values = newChildren(1))
}
