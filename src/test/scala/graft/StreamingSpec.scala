package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.EventsStreaming

/** Streaming semantics driven through MemoryStream micro-batches:
  * windowed aggregation, watermark late-data drop, stateful dedup. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation emits per-window per-type counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventsStreaming.withLateDataHandling(df, "5 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      input.addData(
        (1L, ts("2026-01-01 10:05:00"), "click", 1.0),
        (2L, ts("2026-01-01 10:55:00"), "click", 2.0),
        (3L, ts("2026-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("ws", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("2026-01-01 10:00:00.0", "click", 2L),
        ("2026-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("watermark drops events later than the delay (append mode)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventsStreaming.withLateDataHandling(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("late_agg")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2026-01-01 10:10:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark well past the 10:00 window (+10 min delay)
      input.addData((2L, ts("2026-01-01 12:30:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is an hour behind the watermark -> dropped
      input.addData((3L, ts("2026-01-01 10:20:00"), "click", 99.0))
      q.processAllAvailable()
      val closed = spark.table("late_agg")
        .filter(col("ws") === ts("2026-01-01 10:00:00")).collect()
      assert(closed.length === 1 && closed.head.getAs[Long]("n") === 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions close on event-time timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = EventsStreaming.statefulSessions(df, "1 minute",
        gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      // user 7: two events 5 min apart -> one session
      input.addData(
        (7L, ts("2026-01-01 10:00:00"), 1.0),
        (7L, ts("2026-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("state_sessions").count() === 0) // still open
      // watermark jumps past 10:05 + 10 min gap -> session closes
      input.addData((8L, ts("2026-01-01 11:00:00"), 9.0))
      q.processAllAvailable()
      input.addData((8L, ts("2026-01-01 12:00:00"), 9.0)) // push watermark again
      q.processAllAvailable()
      val closed = spark.table("state_sessions")
        .filter(col("user_id") === 7L).collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("n_events") === 2L)
      assert(closed.head.getAs[Double]("total_value") === 3.0)
      assert(closed.head.getAs[Timestamp]("session_start") === ts("2026-01-01 10:00:00"))
      assert(closed.head.getAs[Timestamp]("session_end") === ts("2026-01-01 10:05:00"))
    } finally q.stop()
  }

  test("statefulSessions closes an intra-batch gap immediately") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = EventsStreaming.statefulSessions(df, "1 minute",
        gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("state_sessions2")
      .outputMode("append").start()
    try {
      // one batch, 30-minute hole between events -> first session closes
      input.addData(
        (5L, ts("2026-01-01 09:00:00"), 1.0),
        (5L, ts("2026-01-01 09:02:00"), 1.0),
        (5L, ts("2026-01-01 09:40:00"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("state_sessions2").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("n_events") === 2L)
      assert(rows.head.getAs[Timestamp]("session_end") === ts("2026-01-01 09:02:00"))
    } finally q.stop()
  }

  test("stateful dedup keeps first occurrence per (event_id, ts)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventsStreaming.dedup(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2026-01-01 10:00:00"), "click", 1.0),
        (1L, ts("2026-01-01 10:00:00"), "click", 1.0),
        (2L, ts("2026-01-01 10:01:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2026-01-01 10:00:00"), "click", 1.0)) // dup again
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("file-source stream over the events fixture matches the batch aggregate") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventsStreaming.windowedAgg(Tables.events(spark, dir), "1 hour")
      .collect().map(_.toString).toSet
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val stream = Tables.eventsTs(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val q = EventsStreaming.withLateDataHandling(stream, "1 minute", "1 hour")
      .writeStream.format("memory").queryName("file_stream_agg")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("file_stream_agg").collect().map(_.toString).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("Kafka-shaped source contract: streamed consumer equals batch parse") {
    // the consumer pipeline is written against KafkaSourceSchema — the
    // exact columns format("kafka") produces — so this stand-in stream
    // (parquet-backed Kafka-shaped records) swaps for a real broker
    // with a one-line source change. No Kafka jars exist here; the
    // schema IS the contract under test.
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val shapedDir = java.nio.file.Files.createTempDirectory("kafka_shape").toString
    EventsStreaming.toKafkaShaped(events).write.mode("overwrite").parquet(shapedDir)
    // the stand-in's schema must BE the Kafka source schema
    val stored = spark.read.parquet(shapedDir)
    assert(stored.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      EventsStreaming.KafkaSourceSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val batch = EventsStreaming.fromKafkaJson(stored)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct-events truth: the serialize->parse trip must be lossless
    val direct = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch === direct)
    val stream = spark.readStream.schema(EventsStreaming.KafkaSourceSchema)
      .parquet(shapedDir)
    assert(stream.isStreaming)
    val q = EventsStreaming.fromKafkaJson(stream)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("kafka_contract")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("kafka_contract").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === direct)
    } finally q.stop()
    // a poisoned topic: malformed value bytes are dropped, not fatal
    import spark.implicits._
    val poisoned = Seq(("k", "not json at all"), ("k", """{"event_id": null}"""))
      .toDF("k", "v")
      .select($"k".cast("binary").as("key"), $"v".cast("binary").as("value"),
        lit("events").as("topic"), lit(0).as("partition"),
        lit(0L).as("offset"), current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
    assert(EventsStreaming.fromKafkaJson(poisoned).count() === 0)
  }

  test("stream-stream attribution join pairs purchases with prior clicks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val cDf = clicks.toDF().toDF("user_id", "ts").withWatermark("ts", "1 minute")
    val pDf = purchases.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "1 minute")
    val q = EventsStreaming.attributionJoin(cDf, pDf, "30 minutes")
      .select("event_id", "c_ts")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode("append").start()
    try {
      clicks.addData((7L, ts("2026-01-01 10:00:00")),
        (7L, ts("2026-01-01 10:20:00")),
        (7L, ts("2026-01-01 09:00:00")),  // outside the 30m horizon
        (8L, ts("2026-01-01 10:10:00")))  // different user
      purchases.addData((100L, 7L, ts("2026-01-01 10:25:00"), 5.0))
      q.processAllAvailable()
      val got = spark.table("attr_join").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
      assert(got === Set(
        (100L, "2026-01-01 10:00:00.0"),
        (100L, "2026-01-01 10:20:00.0")))
    } finally q.stop()
  }

  test("session windows fuse events within the gap (batch mode)") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2026-01-01 10:00:00"), "c", 1.0, 7L),
      (2L, ts("2026-01-01 10:10:00"), "c", 1.0, 7L), // same session (gap 30m)
      (3L, ts("2026-01-01 12:00:00"), "c", 1.0, 7L), // new session
      (4L, ts("2026-01-01 10:05:00"), "c", 1.0, 8L))
      .toDF("event_id", "ts", "event_type", "value", "user_id")
    val out = EventsStreaming.sessions(df, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2) // user 7 first session
    assert(out(1).getAs[Long]("n_events") === 1)
    assert(out(2).getAs[Long]("n_events") === 1)
  }

  test("incremental funnel carries chain state across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("user_id", "ts", "event_type")
    val q = EventsStreaming
      .funnelLevels(df, 3600, Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_lv")
      .outputMode("update").start()
    try {
      input.addData(
        (1L, ts("2026-01-01 10:00:00"), "view"),
        (1L, ts("2026-01-01 10:10:00"), "click"),
        (2L, ts("2026-01-01 10:00:00"), "view"),
        (3L, ts("2026-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      input.addData(
        // u1 completes the chain only via state carried from batch 1
        (1L, ts("2026-01-01 10:20:00"), "purchase"),
        // u2 skips the click step: purchase cannot attach
        (2L, ts("2026-01-01 10:05:00"), "purchase"),
        // u3's click lands past chain-start + 3600s
        (3L, ts("2026-01-01 11:30:00"), "click"))
      q.processAllAvailable()
      // lvl is monotone per user, so the final level is the max emitted
      val fin = spark.table("funnel_lv")
        .groupBy("user_id").agg(max("lvl").as("lvl"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(fin === Map(1L -> 3, 2L -> 1, 3L -> 1))
    } finally q.stop()
  }
}
