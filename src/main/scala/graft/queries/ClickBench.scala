package graft.queries

import graft.{Q, Tables}
import graft.Tables.{dec, avgDec}
import org.apache.spark.sql.functions._

/** ClickBench-shaped sweep (SURVEY.md §2 tier B: the reference's CI
  * gates on the standard ClickBench queries over `hits`,
  * /root/reference/.github/workflows/test.yml:53-61). The `events`
  * fixture is the hits analog here: same shapes — filtered counts,
  * top-k heavy hitters, per-key aggregates, distinct counts, LIKE
  * scans.
  */
object ClickBench {

  val qs: Seq[Q] = Seq(

    // b1: filtered COUNT(*) (Q2 "WHERE AdvEngineID <> 0" shape)
    Q("b1_cb_filtered_count", (s, dir) => {
      Tables.events(s, dir)
        .filter(col("value") > 50.0 && col("event_type") =!= "view")
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT count(*) AS n FROM events
      WHERE value > 50.0 AND event_type <> 'view'"""), bench = true),

    // b2: top-10 heavy hitters (Q13 "GROUP BY UserID ORDER BY c DESC
    // LIMIT 10" shape) — partial agg + TakeOrdered, no full sort
    Q("b2_cb_top_users", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"), 12, 4)).cast("decimal(18,4)").as("sv"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(10)
    }, Some("""
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS sv
      FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"""),
      bench = true),

    // b3: per-key averages (Q6 "AVG(UserID)" family)
    Q("b3_cb_avg_by_type", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), avgDec(col("value")).as("avg_value"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // b4: distinct users per type per day (Q5 "COUNT(DISTINCT UserID)"
    // + date bucketing shape)
    Q("b4_cb_daily_uniques", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("uniq_users"))
        .orderBy("day", "event_type")
    }, Some("""
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(DISTINCT user_id) AS uniq_users
      FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // b5: LIKE substring scan (Q20 "URL LIKE '%google%'" shape)
    Q("b5_cb_like_scan", (s, dir) => {
      Tables.events(s, dir)
        .filter(col("props").like("%\"k\": 1%"))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT count(*) AS n FROM events WHERE props LIKE '%"k": 1%'""")),

    // b6: regexp extraction + group (Q28 REGEXP_REPLACE(Referer) shape)
    Q("b6_cb_regex_extract", (s, dir) => {
      Tables.events(s, dir)
        .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1)
          .cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy("k")
    }, Some("""
      SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
             count(*) AS n
      FROM events GROUP BY 1 ORDER BY k"""), bench = true),

    // b7: time bucketing by minute-of-hour (Q39 time-series shape)
    Q("b7_cb_minute_histo", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(minute(col("ts")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 12, 4)).cast("decimal(18,4)").as("sv"))
        .orderBy("m")
    }, Some("""
      SELECT CAST(minute(ts) AS INT) AS m, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS sv
      FROM events GROUP BY 1 ORDER BY m""")),

    // b8: two-key heavy hitters with HAVING (Q32 shape) — partial agg,
    // filter on the aggregate, top-k without a full sort
    Q("b8_cb_user_type_topk", (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(col("n").desc, col("user_id").asc, col("event_type").asc)
        .limit(20)
    }, Some("""
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type HAVING count(*) >= 3
      ORDER BY n DESC, user_id, event_type LIMIT 20"""))
  )
}
