package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` stream shape (SURVEY.md §2.8:
  * the reference is batch-only; this is the additive north-star path —
  * same transforms work on a batch DataFrame, which is how the
  * correctness oracle exercises them).
  *
  * Scale notes: every aggregation is keyed on (window, key) — state is
  * bounded by watermark eviction; dedup state is bounded by the
  * watermark horizon. No driver-side state.
  */
object EventsStreaming {

  /** Tumbling-window counts/sums per event type. On a streaming input,
    * pair with `withWatermark` (see [[withLateDataHandling]]); on a
    * batch input this is the plain windowed aggregate the oracle
    * checks. */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      // scaled-long sum (see Tables.cents): long adds per row, one
      // rescale per window group — and scaled by 1e4, not 1e2 (r16,
      // advice): this operator's declared output is decimal(18,4), so
      // the fast path must preserve FOUR decimals for any valid input;
      // rounding to cents was a fixture property (2-decimal values),
      // not the operator contract. Identical values on 2-decimal data,
      // now also on any 4-decimal input; same partial-agg state works
      // for the streaming variants.
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000).cast("long")).cast("decimal(22,0)") / 10000)
          .cast("decimal(18,4)").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked variant: late events beyond the delay are dropped and
    * window state is evicted. */
  def withLateDataHandling(stream: DataFrame, delay: String = "10 minutes",
                           windowLength: String = "1 hour"): DataFrame =
    windowedAgg(stream.withWatermark("ts", delay), windowLength)

  /** Dedup by (event_id, ts) within the watermark horizon — removes
    * byte-identical redeliveries; a retry that re-stamps ts survives
    * (use [[dedupById]] for that). */
  def dedup(stream: DataFrame, delay: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", delay)
      .dropDuplicates("event_id", "ts")

  /** Exactly-once dedup by id ALONE: a producer retry re-emitting the
    * same event_id with a refreshed ts still collapses. Streaming
    * inputs use dropDuplicatesWithinWatermark (state evicted once the
    * watermark passes the FIRST sighting — bounded, unlike a plain
    * dropDuplicates(id) whose state grows forever); batch inputs
    * reduce to dropDuplicates on the id. */
  def dedupById(stream: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val w = stream.withWatermark("ts", delay)
    if (stream.isStreaming) w.dropDuplicatesWithinWatermark("event_id")
    else w.dropDuplicates("event_id")
  }

  /** The exact column contract of Spark's Kafka source
    * (`spark.readStream.format("kafka")`): key/value as binary plus the
    * broker metadata columns. The pipeline below is written against
    * THIS schema, so swapping the file/memory stand-in for a real
    * broker is a one-line source change — the sandbox has no Kafka
    * jars/broker, which is exactly why the contract is pinned as a
    * schema instead of a connector dependency. */
  val KafkaSourceSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
  }

  private lazy val eventJsonSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
  }

  /** Events → Kafka-shaped records (the producer side of the contract
    * test): value is JSONEachRow — the ClickHouse Kafka engine's
    * canonical format — key is the user id (so a real topic would be
    * user-partitioned, preserving per-user event order). */
  def toKafkaShaped(events: DataFrame, topic: String = "events"): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))).cast("binary").as("value"),
      lit(topic).as("topic"),
      (col("user_id") % 3).cast("int").as("partition"),
      monotonically_increasing_id().as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))

  /** Kafka-shaped stream → typed events (the consumer side): parses the
    * JSONEachRow value payload; malformed or schema-violating records
    * are dropped rather than poisoning the query (the Kafka-engine
    * `kafka_skip_broken_messages` behavior). Identical on batch and
    * streaming inputs. */
  def fromKafkaJson(kafkaShaped: DataFrame): DataFrame = {
    val missing = KafkaSourceSchema.fieldNames
      .filterNot(kafkaShaped.columns.contains)
    require(missing.isEmpty,
      s"input is not Kafka-shaped: missing columns ${missing.mkString(", ")}")
    kafkaShaped
      .select(from_json(col("value").cast("string"), eventJsonSchema).as("e"))
      .where(col("e").isNotNull && col("e.event_id").isNotNull)
      .select("e.*")
  }

  /** Streaming ingest into a MergeTree table — the Kafka-engine → MV →
    * MergeTree shape, with the file source standing in for the broker:
    * a REAL streaming query (micro-batched, AvailableNow) lands every
    * batch through the engine's insert layout (`appendAligned`:
    * `_part` materialization + ORDER BY clustering), so the streamed
    * table prunes and clusters exactly like a batch-loaded one. No
    * driver materialization: each micro-batch is a distributed write.
    */
  def streamIngestToTable(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    import graft.dialect.Engine
    graft.dialect.ChContext.setup(spark, dir)
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.ev_ingest")
    Engine.execute(spark, """
      CREATE TABLE graft_t.ev_ingest (
        event_id Int64, ts DateTime, user_id Int64,
        event_type String, value Float64)
      ENGINE=MergeTree() PARTITION BY toYYYYMMDD(ts)
      ORDER BY (user_id, ts)""")
    val raw = spark.read.parquet(s"$dir/events.parquet") // schema source
    val q = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet") // the stream's "topic"
      .parquet(dir)
      .transform(graft.Tables.eventsTs)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.dialect.Ddl.appendAligned(batch.sparkSession,
          "graft_t.ev_ingest", batch)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Engine.execute(spark, """
      SELECT _part AS ymd, count() AS n,
             count(DISTINCT user_id) AS users
      FROM graft_t.ev_ingest GROUP BY ymd ORDER BY ymd""")
  }

  /** One in-flight session per user, carried across micro-batches.
    * Timestamps live as MICROS — java.sql.Timestamp.getTime is
    * millisecond-truncating and the fixture has microsecond data. */
  case class SessionAcc(nEvents: Long, totalValue: Double,
                        startUs: Long, lastUs: Long)

  private def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }
  /** A closed session, emitted when the watermark passes `gap` beyond
    * the session's last event. */
  case class ClosedSession(user_id: Long, n_events: Long,
                           total_value: Double,
                           session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp)

  /** Custom-state sessionization with flatMapGroupsWithState (the
    * mapGroupsWithState surface SURVEY §2.8 scopes): unlike the
    * declarative [[sessions]] (session_window), this variant owns its
    * state record — one `SessionAcc` per live user — and emits a
    * ClosedSession exactly when the event-time timeout fires (watermark
    * past last event + gap), the shape a pipeline needs to act on
    * completed sessions. State is per-key and watermark-evicted:
    * bounded at any corpus scale by the number of users active inside
    * one watermark horizon, never by history. Input columns:
    * (user_id Long, ts Timestamp, value Double). */
  def statefulSessions(events: DataFrame, delay: String = "10 minutes",
                       gapMs: Long = 30 * 60 * 1000L): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.selectExpr("user_id", "ts",
        "cast(value AS double) AS value")
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.nEvents, s.totalValue,
              fromMicros(s.startUs), fromMicros(s.lastUs)))
          } else {
            // merge the batch's events into the running session; a gap
            // INSIDE one batch closes the earlier session immediately
            val sorted = rows.toSeq.sortBy(r => toMicros(r._2))
            var acc = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            val gapUs = gapMs * 1000L
            sorted.foreach { case (_, t, v) =>
              val us = toMicros(t)
              if (acc == null) acc = SessionAcc(1L, v, us, us)
              else if (us - acc.lastUs > gapUs) {
                closed += ClosedSession(userId, acc.nEvents, acc.totalValue,
                  fromMicros(acc.startUs), fromMicros(acc.lastUs))
                acc = SessionAcc(1L, v, us, us)
              } else acc = SessionAcc(acc.nEvents + 1, acc.totalValue + v,
                // min/max, not overwrite: a watermark-legal late event
                // from a later micro-batch must not regress the session
                // end (that caused spurious gap-splits on the next event)
                math.min(acc.startUs, us), math.max(acc.lastUs, us))
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.lastUs / 1000L + gapMs)
            closed.iterator
          }
      }
  }

  /** Stream-stream attribution join: each purchase pairs with the same
    * user's clicks in the `horizon` before it. On streaming inputs both
    * sides carry watermarks and the event-time range bounds the join
    * state (Spark evicts click state once the watermark passes
    * click_ts + horizon); on a batch input it is a plain equi+range
    * join — the user_id equality keys the shuffle, the range is a
    * post-join filter, so no theta-join blowup at scale. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      horizon: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.select(col("event_id"), col("user_id"),
      col("ts").as("p_ts"), col("value"))
    p.join(c,
      col("c_user") === col("user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
  }

  /** Batch-mode attribution rollup the oracle checks: purchases with
    * their prior-click counts (zero-click purchases kept via left
    * join). */
  def attributionCounts(events: DataFrame,
                        horizon: String = "30 minutes"): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    p.join(c,
        col("c_user") === col("user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"),
        "left_outer")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("c_ts")).as("n_clicks"))
      .orderBy("event_id")
  }

  /** Per-user funnel carry: chain-start/step timestamps per level plus
    * the best level reached — O(#levels) longs per user, NOT the event
    * history. */
  case class FunnelState(startUs: Array[Long], stepUs: Array[Long], best: Int)

  /** Current funnel level per user. */
  case class FunnelLevel(user_id: Long, lvl: Int)

  /** Incremental windowFunnel over a stream (the streaming face of
    * functions/Funnel.scala's WindowFunnelAgg, strict_increase
    * semantics): per user, the max level k such that steps
    * step1..stepk occurred in strictly-increasing event time with
    * every step within `windowSec` of the CHAIN-START step-1 event.
    *
    * State is the carry arrays alone — O(#steps) longs per user,
    * independent of event count: the 100 TB streaming shape (a
    * buffered-events design would hold every relevant event per user
    * forever). Each micro-batch's group iterator is sorted by event
    * time before advancing the carry, so in-batch disorder is free;
    * CROSS-batch late data is the watermark trade-off the caller
    * accepts (pair with withWatermark upstream to bound it), and the
    * strictly-monotone carry arrays make replayed/duplicate events
    * idempotent. On a batch input the group sees all events at once
    * and the result is exact (the oracle's EXISTS-chain).
    *
    * Emits one (user_id, lvl) row per user per (micro-)batch in
    * Update mode.
    */
  def funnelLevels(events: DataFrame, windowSec: Long,
                   steps: Seq[String]): Dataset[FunnelLevel] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size
    require(n >= 1, "funnelLevels needs at least one step")
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events.selectExpr("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)]
    // every user keeps a group (level-0 users emit 0, matching the
    // batch oracle); non-step events drop inside the group fn
    typed
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelLevel](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(Array.fill(n)(Long.MinValue),
              Array.fill(n)(Long.MinValue), 0))
          val startUs = st.startUs.clone()
          val stepUs = st.stepUs.clone()
          var best = st.best
          val windowUs = windowSec * 1000000L
          // sort the batch's events; the carry then advances in time
          // order exactly like the batch aggregate
          val evs = rows.flatMap(r => stepIdx.get(r._3)
              .map(k => (toMicros(r._2), k))).toArray
            .sortBy(identity)
          evs.foreach { case (t, k) =>
            if (k == 0) {
              if (t > startUs(0) || startUs(0) == Long.MinValue) {
                startUs(0) = t; stepUs(0) = t
              }
              if (best < 1) best = 1
            } else if (startUs(k - 1) != Long.MinValue &&
                       t - startUs(k - 1) <= windowUs &&
                       t > stepUs(k - 1)) {
              startUs(k) = startUs(k - 1)
              stepUs(k) = t
              if (best < k + 1) best = k + 1
            }
          }
          state.update(FunnelState(startUs, stepUs, best))
          FunnelLevel(user, best)
      }
  }

  /** Session windows per user: events within `gap` of each other fuse
    * into one session. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
}
