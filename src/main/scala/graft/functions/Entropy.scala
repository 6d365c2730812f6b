package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** `entropy(x)` — Shannon entropy (log2) of a column's value
  * distribution, ClickHouse semantics (reference delegates it to chdb,
  * /root/reference/main.py:190; DuckDB's same-named aggregate is the
  * oracle).
  *
  * Mergeable partial state — a value→count map, so it runs
  * partial/final like any hash aggregate: one shuffle on the GROUP BY
  * key, state bounded by per-group value cardinality (the same
  * contract as COUNT(DISTINCT); for unbounded-cardinality columns use
  * `uniq` sketches instead). Values round-trip through their string
  * rendering (exact for atomic types, same technique as [[SumMapAgg]]);
  * eval sums over SORTED keys so the double accumulation is
  * deterministic across partition orders.
  */
case class EntropyAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "entropy"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val n = buf.valuesIterator.sum.toDouble
    if (n == 0d) 0d
    else {
      var h = 0d
      buf.toSeq.sortBy(_._1).foreach { case (_, c) =>
        val p = c / n
        h -= p * (math.log(p) / math.log(2d))
      }
      h
    }
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8 (writeUTF caps at 64 KiB — long text
    // values would crash the partial-aggregate shuffle)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EntropyAgg =
    copy(child = newChildren.head)
}
