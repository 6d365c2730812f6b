package graft.queries

import graft.{Q, Tables}
import graft.streaming.EventsStreaming
import org.apache.spark.sql.functions._

/** Streaming transforms exercised in batch mode for the correctness
  * oracle (identical code path: the same windowedAgg/sessions run on
  * readStream inputs — see StreamingSpec for watermark/state
  * semantics). */
object Streaming {

  val qs: Seq[Q] = Seq(

    // ST1: tumbling-window aggregation (epoch-aligned 1h windows ==
    // DuckDB time_bucket)
    // ST6: streaming ingest into a MergeTree table (file source stands
    // in for the broker; AvailableNow real streaming query). The oracle
    // recomputes the per-month stats straight from events — matching
    // proves the streamed rows landed complete, partitioned, and typed.
    Q("st6_stream_ingest", (s, dir) =>
      graft.streaming.EventsStreaming.streamIngestToTable(s, dir),
      Some("""
      SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS ymd,
             count(*) AS n, count(DISTINCT user_id) AS users
      FROM events GROUP BY 1 ORDER BY ymd""")),

    Q("st1_window_agg", (s, dir) => {
      EventsStreaming.windowedAgg(Tables.events(s, dir), "1 hour")
        .orderBy("ws", "event_type")
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""), bench = true),

    // ST3: exactly-once dedup by (event_id, ts) within the watermark
    // horizon — same transform a streaming source runs (state bounded
    // by watermark eviction); the batch oracle is DISTINCT
    Q("st3_stream_dedup", (s, dir) => {
      EventsStreaming.dedup(Tables.events(s, dir))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT count(*) AS n FROM (SELECT DISTINCT event_id, ts FROM events)""")),

    // ST3b: exactly-once dedup by id ALONE (producer retries with a
    // refreshed ts collapse) — streaming inputs run
    // dropDuplicatesWithinWatermark, whose state the watermark bounds
    Q("st7_stream_dedup_id", (s, dir) => {
      EventsStreaming.dedupById(Tables.events(s, dir))
        .agg(count(lit(1)).as("n"))
    }, Some("SELECT count(DISTINCT event_id) AS n FROM events")),

    // ST2: session windows per user with a 30-minute gap. DuckDB
    // reproduces session fusion with a lag/cumulative-sum rewrite.
    Q("st2_sessions", (s, dir) => {
      EventsStreaming.sessions(Tables.events(s, dir), "30 minutes")
        .orderBy("user_id", "session_start")
    }, Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, value FROM events),
      marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
        FROM e),
      grouped AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked)
      SELECT min(ts) AS session_start,
             max(ts) + INTERVAL '30 minutes' AS session_end,
             user_id, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS session_value
      FROM grouped GROUP BY user_id, session_id
      ORDER BY user_id, session_start""")),

    // ST4: custom-state sessionization (flatMapGroupsWithState,
    // event-time timeout). In batch mode state starts empty and
    // timeouts never fire, so exactly the sessions CLOSED by a
    // following gap emit — which the oracle reproduces by dropping
    // each user's last session. total_value is spec-asserted
    // (StreamingSpec); the oracle row keeps the exact columns.
    Q("st4_stateful_sessions", (s, dir) => {
      EventsStreaming.statefulSessions(
          Tables.events(s, dir).select("user_id", "ts", "value"),
          gapMs = 30 * 60 * 1000L)
        .toDF()
        .select("user_id", "n_events", "session_start", "session_end")
        .orderBy("user_id", "session_start")
    }, Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
      marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
        FROM e),
      grouped AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      sess AS (
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM grouped GROUP BY user_id, session_id),
      last AS (SELECT user_id, max(session_id) AS max_sid FROM sess GROUP BY user_id)
      SELECT s.user_id, s.n_events, s.session_start, s.session_end
      FROM sess s JOIN last l
        ON s.user_id = l.user_id AND s.session_id < l.max_sid
      ORDER BY s.user_id, session_start""")),

    // ST8: incremental streaming funnel — per-user windowFunnel with
    // O(#steps) carry state instead of buffered events
    // (EventsStreaming.funnelLevels; cross-micro-batch state continuity
    // is pinned in StreamingSpec). Batch run == the strict EXISTS-chain
    // oracle, same as g18_window_funnel's — including its same-timestamp
    // tie caveat (see the g18 comment in Dialect.scala): exact on these
    // fixtures because per-user funnel-step timestamps never tie.
    Q("st8_stream_funnel", (s, dir) => {
      EventsStreaming.funnelLevels(Tables.events(s, dir), 3600,
          Seq("view", "click", "purchase"))
        .toDF()
        .groupBy(col("lvl")).agg(count(lit(1)).as("users"))
        .orderBy("lvl")
    }, Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      lv AS (SELECT u.user_id,
        CASE
          WHEN EXISTS (SELECT 1 FROM events v, events c, events p
                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                   AND p.user_id = u.user_id
                   AND v.event_type = 'view' AND c.event_type = 'click'
                   AND p.event_type = 'purchase'
                   AND c.ts > v.ts AND p.ts > c.ts
                   AND c.ts <= v.ts + INTERVAL 3600 SECOND
                   AND p.ts <= v.ts + INTERVAL 3600 SECOND) THEN 3
          WHEN EXISTS (SELECT 1 FROM events v, events c
                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                   AND v.event_type = 'view' AND c.event_type = 'click'
                   AND c.ts > v.ts
                   AND c.ts <= v.ts + INTERVAL 3600 SECOND) THEN 2
          WHEN EXISTS (SELECT 1 FROM events v
                 WHERE v.user_id = u.user_id
                   AND v.event_type = 'view') THEN 1
          ELSE 0 END AS lvl
        FROM u)
      SELECT lvl, count(*) AS users FROM lv GROUP BY lvl ORDER BY lvl""")),

    // ST5: stream-stream attribution join — each purchase with the
    // count of the same user's clicks in the preceding 30 minutes
    // (zero-click purchases kept). The streaming variant (watermarked
    // both sides, state bounded by the event-time range) runs in
    // StreamingSpec; this batch run is the identical transform.
    Q("st5_attribution_join", (s, dir) => {
      EventsStreaming.attributionCounts(Tables.events(s, dir), "30 minutes")
    }, Some("""
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) p_ts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, CAST(ts AS TIMESTAMP) c_ts
            FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, count(c.c_ts) AS n_clicks
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id AND c.c_ts <= p.p_ts
       AND c.c_ts >= p.p_ts - INTERVAL '30 minutes'
      GROUP BY 1, 2 ORDER BY event_id""")),

    // ST9: Kafka source contract — events serialized to Kafka-shaped
    // records (binary key/value + broker metadata, value = JSONEachRow,
    // the ClickHouse Kafka-engine format) and parsed back through
    // fromKafkaJson. Matching the direct-events oracle proves the
    // serialize→parse round trip is lossless, types included; the
    // STREAMING run of the same consumer (readStream over the contract
    // schema) is pinned in StreamingSpec.
    Q("st9_kafka_contract", (s, dir) => {
      EventsStreaming.fromKafkaJson(
          EventsStreaming.toKafkaShaped(Tables.events(s, dir)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          sum(col("event_id")).as("id_sum"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
             CAST(sum(event_id) AS BIGINT) AS id_sum
      FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
