package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Behavioral / funnel analytics aggregates: `windowFunnel`,
  * `sequenceMatch`, `sequenceCount` (SURVEY §2.7 tier C; the reference
  * delegates these ClickHouse aggregates to chdb wholesale,
  * /root/reference/main.py:190 — semantics re-implemented here from the
  * published ClickHouse documentation, engine re-expressed Spark-first).
  *
  * All three share one distributed shape: a TypedImperativeAggregate
  * whose buffer is the group's condition-matching events as
  * `(timestamp, condition-bitmask)` pairs. Rows matching NO condition
  * are not buffered (the documented ClickHouse behavior — events that
  * satisfy none of the conditions are disregarded), so state per group
  * is bounded by that group's RELEVANT events, not its row count — at
  * 100 TB the per-user funnel state is a few dozen pairs, merged
  * partial/final like any hash aggregate (no global sort, no shuffle
  * beyond the groupBy's own).
  *
  * Timestamps: TIMESTAMP/TIMESTAMP_NTZ children buffer as micros and
  * window lengths are given in SECONDS (the ClickHouse DateTime
  * contract); integral children buffer raw and the window shares their
  * unit (the ClickHouse UInt32-epoch contract).
  */
abstract class EventSequenceAgg
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  def ts: Expression
  def conds: Seq[Expression]

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false

  // NOTE: no constructor-body logic here — Catalyst expressions are
  // Java-serialized to executors and the superclass constructor re-runs
  // against still-null subclass fields (arity is validated in the
  // ChFunctions builders instead).

  /** Window/timestamp unit scale: micros per second for timestamp
    * children, 1 for raw integral timestamps. */
  protected def tsScale: Long = ts.dataType match {
    case _: TimestampType | TimestampNTZType => 1000000L
    case _ => 1L
  }

  private def tsMicros(input: InternalRow): Option[Long] = {
    val v = ts.eval(input)
    if (v == null) None
    else v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case other => Some(other.toString.toLong)
    }
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    var mask = 0L
    var i = 0
    while (i < conds.size) {
      if (conds(i).eval(input) == true) mask |= (1L << i)
      i += 1
    }
    if (mask != 0L) tsMicros(input).foreach(t => buf += ((t, mask)))
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    buf
  }

  /** Events in deterministic time order (ties broken by mask) — the
    * per-group sequence every finisher walks. */
  protected def sorted(buf: ArrayBuffer[(Long, Long)]): Array[(Long, Long)] =
    buf.toArray.sortBy(identity)

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, m) => out.writeLong(t); out.writeLong(m) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Long, Long)](n)
    (0 until n).foreach(_ => buf += ((in.readLong(), in.readLong())))
    buf
  }
}

/** `windowFunnel(window[, modes...])(ts, c1, .., cN)` — the maximum
  * funnel level reached: the longest prefix c1..ck completed by some
  * event chain whose every step lies within `window` of the
  * CHAIN-START event (the documented ClickHouse sliding-window
  * contract). Single left-to-right pass over the sorted events carrying
  * the chain-start timestamp upward level by level; the level-1 start
  * keeps the LATEST qualifying event (maximal remaining window slack),
  * so one O(E*N) scan dominates every existential chain.
  *
  * Modes (each re-implemented from the published docs and pinned by
  * PropertySpec brute-force mirrors):
  *   - `strictIncrease` ('strict_increase'): each step's timestamp
  *     strictly exceeds the previous step's;
  *   - `strictOrder` ('strict_order'): no interleaving — the chain must
  *     be CONSECUTIVE within the group's condition-matching events
  *     (A→B→D→C finds A→B, the D cuts the search toward C);
  *   - `strictDedup` ('strict_deduplication'): an event repeating a
  *     condition the chain already passed interrupts that chain's
  *     further processing (its reached level still counts).
  */
case class WindowFunnelAgg(
    window: Long,
    strictIncrease: Boolean,
    ts: Expression,
    conds: Seq[Expression],
    strictOrder: Boolean = false,
    strictDedup: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends EventSequenceAgg {

  override def prettyName: String = "windowFunnel"
  override def dataType: DataType = IntegerType

  /** strict_order: chains are consecutive runs in the event
    * subsequence — walk each possible start. O(E*N) total since a
    * consecutive chain can only extend N-1 steps. */
  private def evalStrictOrder(events: Array[(Long, Long)], n: Int,
                              windowT: Long): Int = {
    var best = 0
    var i = 0
    while (i < events.length) {
      if ((events(i)._2 & 1L) == 1L) {
        val start = events(i)._1
        var lvl = 1
        var j = i + 1
        var lastT = start
        var go = true
        while (go && j < events.length && lvl < n) {
          val (t, mask) = events(j)
          if (((mask >> lvl) & 1L) == 1L && t - start <= windowT &&
              (!strictIncrease || t > lastT)) {
            lvl += 1; lastT = t; j += 1
          } else go = false // any other event interleaves: chain cut
        }
        if (lvl > best) best = lvl
      }
      i += 1
    }
    best
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val events = sorted(buf)
    val n = conds.size
    val windowT = window * tsScale
    if (strictOrder) return evalStrictOrder(events, n, windowT)
    // startTs(k): chain-start ts of a chain that has reached level k+1;
    // stepTs(k): ts of that chain's level-(k+1) event (strict mode)
    val startTs = Array.fill(n)(Long.MinValue)
    val stepTs = Array.fill(n)(Long.MinValue)
    var best = 0
    events.foreach { case (t, mask) =>
      // strict_dedup: an event repeating condition k interrupts every
      // chain that already contains a cond-k step (levels >= k) —
      // killed BEFORE this event may extend anything, so a dead chain
      // cannot advance off the very event that killed it
      if (strictDedup) {
        var kk = 0
        while (kk < n) {
          if (((mask >> kk) & 1L) == 1L) {
            var j = kk
            while (j < n) {
              startTs(j) = Long.MinValue; stepTs(j) = Long.MinValue
              j += 1
            }
          }
          kk += 1
        }
      }
      // bits DESCENDING: an event satisfying several conditions must
      // not advance level k off its own level-(k-1) update (a chain
      // may not use one event twice; ascending order self-clobbered
      // stepTs and killed real chains — found by PropertySpec's
      // brute-force cross-check)
      var k = n - 1
      while (k >= 0) {
        if (((mask >> k) & 1L) == 1L) {
          if (k == 0) {
            if (t > startTs(0) || startTs(0) == Long.MinValue) {
              startTs(0) = t; stepTs(0) = t
            }
            if (best < 1) best = 1
          } else if (startTs(k - 1) != Long.MinValue &&
                     t - startTs(k - 1) <= windowT &&
                     (!strictIncrease || t > stepTs(k - 1))) {
            startTs(k) = startTs(k - 1)
            stepTs(k) = t
            if (best < k + 1) best = k + 1
          }
        }
        k -= 1
      }
    }
    best
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnelAgg =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `deltaSumTimestamp(value, ts)` — sum of POSITIVE deltas between
  * consecutive values in event-time order (the counter-reset-tolerant
  * rate primitive; re-implemented from the published docs — the
  * reference delegates it to chdb, main.py:190). Buffers (ts, value)
  * pairs and differences them sorted at finish: EXACT under
  * distribution and merge order, unlike a boundary-only state, at the
  * cost of per-group state linear in the group's rows — the honest
  * trade-off, documented; ClickHouse's own merge is order-sensitive.
  * Ties on ts break by value so the result is deterministic.
  */
case class DeltaSumTimestampAgg(
    value: Expression,
    tsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Double)]] {

  override def children: Seq[Expression] = Seq(value, tsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deltaSumTimestamp"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] =
    ArrayBuffer.empty

  private def num(a: Any): Option[Double] = a match {
    case null => None
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case other => Some(other.toString.toDouble)
  }

  override def update(buf: ArrayBuffer[(Long, Double)],
                      input: InternalRow): ArrayBuffer[(Long, Double)] = {
    val t = tsExpr.eval(input)
    val v = value.eval(input)
    if (t != null && v != null)
      num(t.asInstanceOf[Any]).zip(num(v)).foreach { case (tt, vv) =>
        buf += ((tt.toLong, vv))
      }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Double)],
                     other: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    buf ++= other; buf
  }

  override def eval(buf: ArrayBuffer[(Long, Double)]): Any = {
    val s = buf.toArray.sortBy(identity)
    var sum = 0.0
    var i = 1
    while (i < s.length) {
      val d = s(i)._2 - s(i - 1)._2
      if (d > 0) sum += d
      i += 1
    }
    sum
  }

  override def serialize(buf: ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, v) => out.writeLong(t); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Long, Double)](n)
    (0 until n).foreach(_ => buf += ((in.readLong(), in.readDouble())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DeltaSumTimestampAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DeltaSumTimestampAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DeltaSumTimestampAgg =
    copy(value = newChildren(0), tsExpr = newChildren(1))
}

/** Pattern tokens for sequenceMatch/sequenceCount: `(?N)` = an event
  * satisfying condition N, `.` = exactly one event (of the buffered,
  * i.e. some-condition-matching, events), `.*` = any number of events,
  * `(?t OP n)` = the NEXT matched event's timestamp relative to the
  * PREVIOUS matched event's, `n` in the timestamp column's seconds
  * (the documented ClickHouse time-constraint semantics; OP is one of
  * <= < >= > == !=). Anything else raises at plan time rather than
  * silently mis-matching.
  */
private[graft] object SeqPattern {
  sealed trait Tok
  case class Cond(n: Int) extends Tok
  case object AnyOne extends Tok
  case object AnyMany extends Tok
  case class TimeCond(op: String, seconds: Long) extends Tok

  private val tokRe =
    "\\(\\?(\\d+)\\)|\\(\\?t\\s*(<=|>=|==|!=|<|>)\\s*(\\d+)\\)|\\.\\*|\\.".r

  def parse(pattern: String, nConds: Int): Array[Tok] = {
    val toks = ArrayBuffer.empty[Tok]
    var pos = 0
    tokRe.findAllMatchIn(pattern).foreach { m =>
      require(m.start == pos,
        s"unsupported sequence pattern at '${pattern.substring(pos)}' " +
          "(supported: (?N), (?t<=n), ., .*)")
      toks += (m.matched match {
        case ".*" => AnyMany
        case "." => AnyOne
        case _ if m.group(2) != null =>
          TimeCond(m.group(2), m.group(3).toLong)
        case _ =>
          val n = m.group(1).toInt
          require(n >= 1 && n <= nConds,
            s"pattern condition (?$n) out of range 1..$nConds")
          Cond(n)
      })
      pos = m.end
    }
    require(pos == pattern.length,
      s"unsupported sequence pattern tail '${pattern.substring(pos)}'")
    require(toks.nonEmpty, "empty sequence pattern")
    // every (?t OP n) must sit between two CONSUMED events — one
    // before it (else prevTs is undefined and the check would be
    // silently skipped) and one after it (else the pending constraint
    // is never applied and the pattern silently fails every match).
    // ClickHouse rejects both shapes at parse time; so do we, honoring
    // the scaladoc contract that unsupported patterns raise at plan
    // time. `.*` does not consume for this purpose — it pins no
    // timestamp.
    def consuming(t: Tok): Boolean = t match {
      case Cond(_) | AnyOne => true
      case _ => false
    }
    toks.zipWithIndex.foreach {
      case (_: TimeCond, i) =>
        require(toks.take(i).exists(consuming) &&
            toks.drop(i + 1).exists(consuming),
          "sequence pattern time constraint (?t...) must be between " +
            "two event conditions")
      case _ => ()
    }
    toks.toArray
  }

  private def timeOk(op: String, delta: Long, bound: Long): Boolean = op match {
    case "<=" => delta <= bound
    case "<" => delta < bound
    case ">=" => delta >= bound
    case ">" => delta > bound
    case "==" => delta == bound
    case "!=" => delta != bound
  }

  /** Earliest end index (exclusive) of a match of `toks` starting
    * exactly at event `from`, or -1. `prevTs` = timestamp of the last
    * event a Cond/AnyOne consumed; `pending` = time constraints
    * awaiting the next consumed event. Backtracking; patterns are tiny
    * and the event list is one group's relevant events. `scale` =
    * ticks per second of the timestamp column. */
  def matchEnd(toks: Array[Tok], events: Array[(Long, Long)],
               tok: Int, from: Int, scale: Long = 1L,
               prevTs: Long = Long.MinValue,
               pending: List[TimeCond] = Nil): Int = {
    if (tok == toks.length) return if (pending.isEmpty) from else -1
    def consume(next: Int): Int = {
      val t = events(next)._1
      val ok = prevTs == Long.MinValue ||
        pending.forall(tc => timeOk(tc.op, t - prevTs, tc.seconds * scale))
      if (ok) matchEnd(toks, events, tok + 1, next + 1, scale, t, Nil) else -1
    }
    toks(tok) match {
      case Cond(n) =>
        if (from < events.length && ((events(from)._2 >> (n - 1)) & 1L) == 1L)
          consume(from)
        else -1
      case AnyOne =>
        if (from < events.length) consume(from) else -1
      case tc: TimeCond =>
        matchEnd(toks, events, tok + 1, from, scale, prevTs, tc :: pending)
      case AnyMany =>
        var j = from
        while (j <= events.length) {
          val e = matchEnd(toks, events, tok + 1, j, scale, prevTs, pending)
          if (e >= 0) return e
          j += 1
        }
        -1
    }
  }

  /** First match at or after `from`: (startIdx, endIdx) or null. */
  def search(toks: Array[Tok], events: Array[(Long, Long)],
             from: Int, scale: Long = 1L): (Int, Int) = {
    var s = from
    while (s <= events.length) {
      val e = matchEnd(toks, events, 0, s, scale)
      if (e >= 0) return (s, e)
      s += 1
    }
    null
  }
}

/** `sequenceMatch('pattern')(ts, c1, .., cN)` → 1 if the group's
  * time-ordered relevant events contain a chain matching the pattern,
  * else 0 (the ClickHouse UInt8 contract).
  */
case class SequenceMatchAgg(
    pattern: String,
    ts: Expression,
    conds: Seq[Expression],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends EventSequenceAgg {

  override def prettyName: String = "sequenceMatch"
  override def dataType: DataType = IntegerType

  @transient private lazy val toks = SeqPattern.parse(pattern, conds.size)

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    if (SeqPattern.search(toks, sorted(buf), 0, tsScale) != null) 1 else 0

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceMatchAgg =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequenceCount('pattern')(ts, c1, .., cN)` → number of
  * NON-OVERLAPPING pattern matches, scanning left to right and
  * resuming after each match's end (the documented ClickHouse
  * contract).
  */
case class SequenceCountAgg(
    pattern: String,
    ts: Expression,
    conds: Seq[Expression],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends EventSequenceAgg {

  override def prettyName: String = "sequenceCount"
  override def dataType: DataType = LongType

  @transient private lazy val toks = SeqPattern.parse(pattern, conds.size)

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val events = sorted(buf)
    var from = 0
    var count = 0L
    var hit = SeqPattern.search(toks, events, from, tsScale)
    while (hit != null) {
      count += 1
      // an all-`.*` pattern matches zero events: still must advance
      from = math.max(hit._2, hit._1 + 1)
      hit = if (from > events.length) null
            else SeqPattern.search(toks, events, from, tsScale)
    }
    count
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceCountAgg =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
