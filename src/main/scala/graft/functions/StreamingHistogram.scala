package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** `histogram(N)(x)` — adaptive equal-ish-mass histogram as a bounded
  * mergeable sketch: the streaming parallel histogram of Ben-Haim &
  * Tong ("A Streaming Parallel Decision Tree Algorithm", JMLR 2010) —
  * the same published algorithm family ClickHouse documents for its
  * `histogram`. State is at most `2N` (centroid, count) pairs plus the
  * global min/max; inserts append and lazily re-trim by merging the
  * closest centroid pair; partial states merge by concatenation +
  * re-trim — a textbook partial/final aggregate, O(N) state at any
  * data volume.
  *
  * Result: Array(Struct(lower, upper, height)) — adjacent-centroid
  * midpoints bound each bin (outer bounds are the observed min/max)
  * and height is the bin's point mass, so Σ height == COUNT(x)
  * exactly; bins are ≤ N always, and == min(N, distinct values) once
  * trimmed.
  */
case class HistogramAgg(
    bins: Int,
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistogramAgg.Buf] {

  import HistogramAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "histogram"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("height", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Buf =
    Buf(ArrayBuffer.empty, Double.PositiveInfinity, Double.NegativeInfinity)

  /** Merge closest adjacent centroids until at most `bins` remain. */
  private def trim(buf: Buf): Buf = {
    val pts = buf.points
    if (pts.length <= bins) return buf
    val sorted = ArrayBuffer.empty[(Double, Double)]
    sorted ++= pts.sortBy(_._1)
    // coalesce exact-duplicate centroids first
    val dedup = ArrayBuffer.empty[(Double, Double)]
    sorted.foreach { case (c, w) =>
      if (dedup.nonEmpty && dedup.last._1 == c)
        dedup(dedup.length - 1) = (c, dedup.last._2 + w)
      else dedup += ((c, w))
    }
    while (dedup.length > bins) {
      var minGap = Double.PositiveInfinity
      var at = 0
      var i = 0
      while (i < dedup.length - 1) {
        val gap = dedup(i + 1)._1 - dedup(i)._1
        if (gap < minGap) { minGap = gap; at = i }
        i += 1
      }
      val (c1, w1) = dedup(at); val (c2, w2) = dedup(at + 1)
      dedup(at) = ((c1 * w1 + c2 * w2) / (w1 + w2), w1 + w2)
      dedup.remove(at + 1)
    }
    Buf(dedup, buf.min, buf.max)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val x = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: Decimal => d.toDouble
      case other => other.toString.toDouble
    }
    buf.points += ((x, 1.0))
    val next = Buf(buf.points, math.min(buf.min, x), math.max(buf.max, x))
    if (next.points.length >= bins * 2) trim(next) else next
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.points ++= other.points
    trim(Buf(buf.points, math.min(buf.min, other.min),
      math.max(buf.max, other.max)))
  }

  override def eval(buf0: Buf): Any = {
    val buf = trim(buf0)
    val pts = buf.points.sortBy(_._1)
    if (pts.isEmpty) return new GenericArrayData(Array.empty[Any])
    val rows = pts.indices.map { i =>
      val lower = if (i == 0) buf.min
                  else (pts(i - 1)._1 + pts(i)._1) / 2
      val upper = if (i == pts.length - 1) buf.max
                  else (pts(i)._1 + pts(i + 1)._1) / 2
      InternalRow(lower, upper, pts(i)._2)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.points.length)
    buf.points.foreach { case (c, w) => out.writeDouble(c); out.writeDouble(w) }
    out.writeDouble(buf.min); out.writeDouble(buf.max)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val pts = new ArrayBuffer[(Double, Double)](n)
    (0 until n).foreach(_ => pts += ((in.readDouble(), in.readDouble())))
    Buf(pts, in.readDouble(), in.readDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}

object HistogramAgg {
  /** (centroid, weight) pool + observed bounds. */
  case class Buf(points: ArrayBuffer[(Double, Double)],
                 min: Double, max: Double)
}
