package graft.queries

import graft.{Q, Tables}
import graft.Tables.{dec, avgDec}
import graft.dialect.{Engine, HitsFixture}
import org.apache.spark.sql.functions._

/** ClickBench sweep (SURVEY.md §2 tier B: the reference's CI gates on
  * the standard ClickBench queries over `hits`,
  * /root/reference/.github/workflows/test.yml:53-61).
  *
  * Two layers:
  *   - b1-b8: the sweep's shapes over the driver's `events` fixture
  *     (filtered counts, heavy hitters, distinct counts, LIKE scans);
  *   - cb00-cb42: the REAL 43-query sweep, run as ClickHouse-dialect
  *     statements through [[Engine.execute]] against the synthetic
  *     [[HitsFixture]] `hits` table (created with the reference CI's
  *     own DDL). Each oracle re-derives the identical table in DuckDB
  *     via [[HitsFixture.oracle]].
  *
  * Adaptations from the published query texts, each forced by the
  * synthetic fixture or the hash-compare (shapes untouched):
  *   - deterministic tiebreak keys appended to every ORDER BY (the
  *     originals allow ties, which a row-hash compare cannot);
  *   - every output column aliased (Spark and DuckDB generate
  *     different default names for `COUNT(*)` etc.);
  *   - selectivity constants retargeted to fixture values (UserID /
  *     RefererHash / URLHash / IsRefresh→Refresh naming of the
  *     reference's own hits_v1 DDL) and HAVING/OFFSET thresholds
  *     scaled from the 100M-row dataset to the 300k-row fixture;
  *   - cb03: avg of a UInt64 column — Spark computes DECIMAL(24,4),
  *     so the DuckDB side rounds to the same 4 decimals (the fixture's
  *     prime row count guarantees no rounding tie);
  *   - cb28: regex/backref spelling per engine (Spark `$1`+escaped
  *     literals, DuckDB `\1`).
  */
object ClickBench {

  /** Official sweep entry: same text through the dialect engine and
    * (CTE-prefixed) through DuckDB. */
  private def cb(name: String, sql: String, duckSql: String = null): Q =
    Q(name, (s, _) => { HitsFixture.ensure(s); Engine.execute(s, sql) },
      Some(HitsFixture.oracle(Option(duckSql).getOrElse(sql))))

  val cbQs: Seq[Q] = Seq(
    cb("cb00_count", "SELECT COUNT(*) AS c FROM hits"),
    cb("cb01_adv_count", "SELECT COUNT(*) AS c FROM hits WHERE AdvEngineID <> 0"),
    // duck variants cast SUM to BIGINT: DuckDB integer SUM returns
    // HUGEINT, which pandas renders as float — Spark's is int64
    cb("cb02_sum_count_avg",
      "SELECT SUM(AdvEngineID) AS s, COUNT(*) AS c, AVG(ResolutionWidth) AS a FROM hits",
      "SELECT CAST(SUM(AdvEngineID) AS BIGINT) AS s, COUNT(*) AS c, AVG(ResolutionWidth) AS a FROM hits"),
    cb("cb03_avg_userid", "SELECT AVG(UserID) AS a FROM hits",
      "SELECT round(AVG(UserID), 4) AS a FROM hits"),
    cb("cb04_uniq_users", "SELECT COUNT(DISTINCT UserID) AS u FROM hits"),
    cb("cb05_uniq_phrases", "SELECT COUNT(DISTINCT SearchPhrase) AS p FROM hits"),
    cb("cb06_minmax_date", "SELECT MIN(EventDate) AS dmin, MAX(EventDate) AS dmax FROM hits"),
    cb("cb07_adv_group", """
      SELECT AdvEngineID, COUNT(*) AS c FROM hits WHERE AdvEngineID <> 0
      GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID"""),
    cb("cb08_region_uniq", """
      SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits
      GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10"""),
    cb("cb09_region_wide", """
      SELECT RegionID, SUM(AdvEngineID) AS s, COUNT(*) AS c,
             AVG(ResolutionWidth) AS a, COUNT(DISTINCT UserID) AS u
      FROM hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10""", """
      SELECT RegionID, CAST(SUM(AdvEngineID) AS BIGINT) AS s, COUNT(*) AS c,
             AVG(ResolutionWidth) AS a, COUNT(DISTINCT UserID) AS u
      FROM hits GROUP BY RegionID ORDER BY c DESC, RegionID LIMIT 10"""),
    cb("cb10_phone_model", """
      SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits
      WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel
      ORDER BY u DESC, MobilePhoneModel LIMIT 10"""),
    cb("cb11_phone_pair", """
      SELECT MobilePhone, MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits
      WHERE MobilePhoneModel <> '' GROUP BY MobilePhone, MobilePhoneModel
      ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10"""),
    cb("cb12_top_phrases", """
      SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"""),
    cb("cb13_phrase_users", """
      SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits
      WHERE SearchPhrase <> '' GROUP BY SearchPhrase
      ORDER BY u DESC, SearchPhrase LIMIT 10"""),
    cb("cb14_engine_phrase", """
      SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits
      WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase
      ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10"""),
    cb("cb15_top_users", """
      SELECT UserID, COUNT(*) AS c FROM hits GROUP BY UserID
      ORDER BY c DESC, UserID LIMIT 10"""),
    cb("cb16_user_phrase", """
      SELECT UserID, SearchPhrase, COUNT(*) AS c FROM hits
      GROUP BY UserID, SearchPhrase ORDER BY c DESC, UserID, SearchPhrase LIMIT 10"""),
    // official cb17 has no ORDER BY (any 10 groups); made deterministic
    cb("cb17_user_phrase_any", """
      SELECT UserID, SearchPhrase, COUNT(*) AS c FROM hits
      GROUP BY UserID, SearchPhrase ORDER BY UserID, SearchPhrase LIMIT 10"""),
    cb("cb18_user_minute", """
      SELECT UserID, extract(minute FROM EventTime) AS m, SearchPhrase, COUNT(*) AS c
      FROM hits GROUP BY UserID, m, SearchPhrase
      ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10"""),
    cb("cb19_point_user", "SELECT UserID FROM hits WHERE UserID = 100123"),
    cb("cb20_url_like", "SELECT COUNT(*) AS c FROM hits WHERE URL LIKE '%google%'"),
    cb("cb21_like_phrase", """
      SELECT SearchPhrase, MIN(URL) AS u, COUNT(*) AS c FROM hits
      WHERE URL LIKE '%google%' AND SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"""),
    cb("cb22_title_google", """
      SELECT SearchPhrase, MIN(URL) AS u, MIN(Title) AS t, COUNT(*) AS c,
             COUNT(DISTINCT UserID) AS uu
      FROM hits WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%'
        AND SearchPhrase <> ''
      GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"""),
    // SELECT * with list cells rendered as text (the compare boundary
    // can't sort rows on raw arrays; see HitsFixture.starProjections)
    cb("cb23_star_scan",
      s"SELECT ${HitsFixture.starProjections._1} FROM hits " +
        "WHERE URL LIKE '%google%' ORDER BY EventTime, WatchID LIMIT 10",
      s"SELECT ${HitsFixture.starProjections._2} FROM hits " +
        "WHERE URL LIKE '%google%' ORDER BY EventTime, WatchID LIMIT 10"),
    cb("cb24_phrase_by_time", """
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY EventTime, WatchID LIMIT 10"""),
    cb("cb25_phrase_by_phrase", """
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY SearchPhrase LIMIT 10"""),
    cb("cb26_phrase_by_both", """
      SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
      ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10"""),
    cb("cb27_counter_urllen", """
      SELECT CounterID, AVG(length(URL)) AS l, COUNT(*) AS c FROM hits
      WHERE URL <> '' GROUP BY CounterID HAVING COUNT(*) > 10000
      ORDER BY l DESC, CounterID LIMIT 25"""),
    cb("cb28_referer_domain", """
      SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\.)?([^/]+)/.*$', '$1') AS k,
             AVG(length(Referer)) AS l, COUNT(*) AS c, MIN(Referer) AS mr
      FROM hits WHERE Referer <> '' GROUP BY k HAVING COUNT(*) > 10000
      ORDER BY l DESC, k LIMIT 25""", """
      SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\.)?([^/]+)/.*$', '\1') AS k,
             AVG(length(Referer)) AS l, COUNT(*) AS c, MIN(Referer) AS mr
      FROM hits WHERE Referer <> '' GROUP BY k HAVING COUNT(*) > 10000
      ORDER BY l DESC, k LIMIT 25"""),
    cb("cb29_ninety_sums",
      "SELECT " + (0 to 89).map(i => s"SUM(ResolutionWidth + $i) AS s$i").mkString(", ") +
        " FROM hits",
      "SELECT " + (0 to 89).map(i =>
        s"CAST(SUM(ResolutionWidth + $i) AS BIGINT) AS s$i").mkString(", ") +
        " FROM hits"),
    cb("cb30_engine_ip", """
      SELECT SearchEngineID, ClientIP, COUNT(*) AS c, SUM(Refresh) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP
      ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10""", """
      SELECT SearchEngineID, ClientIP, COUNT(*) AS c, CAST(SUM(Refresh) AS BIGINT) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP
      ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10"""),
    cb("cb31_watch_ip", """
      SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(Refresh) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits WHERE SearchPhrase <> '' GROUP BY WatchID, ClientIP
      ORDER BY c DESC, WatchID LIMIT 10""", """
      SELECT WatchID, ClientIP, COUNT(*) AS c, CAST(SUM(Refresh) AS BIGINT) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits WHERE SearchPhrase <> '' GROUP BY WatchID, ClientIP
      ORDER BY c DESC, WatchID LIMIT 10"""),
    cb("cb32_watch_ip_all", """
      SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(Refresh) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits GROUP BY WatchID, ClientIP ORDER BY c DESC, WatchID LIMIT 10""", """
      SELECT WatchID, ClientIP, COUNT(*) AS c, CAST(SUM(Refresh) AS BIGINT) AS sr,
             AVG(ResolutionWidth) AS a
      FROM hits GROUP BY WatchID, ClientIP ORDER BY c DESC, WatchID LIMIT 10"""),
    cb("cb33_top_urls", """
      SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL
      ORDER BY c DESC, URL LIMIT 10"""),
    cb("cb34_one_url", """
      SELECT 1 AS one, URL, COUNT(*) AS c FROM hits GROUP BY 1, URL
      ORDER BY c DESC, URL LIMIT 10"""),
    cb("cb35_ip_arith", """
      SELECT ClientIP, ClientIP - 1 AS c1, ClientIP - 2 AS c2, ClientIP - 3 AS c3,
             COUNT(*) AS c
      FROM hits GROUP BY ClientIP, c1, c2, c3 ORDER BY c DESC, ClientIP LIMIT 10"""),
    cb("cb36_pageviews_url", """
      SELECT URL, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND DontCountHits = 0 AND Refresh = 0 AND URL <> ''
      GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10"""),
    cb("cb37_pageviews_title", """
      SELECT Title, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND DontCountHits = 0 AND Refresh = 0 AND Title <> ''
      GROUP BY Title ORDER BY PageViews DESC, Title LIMIT 10"""),
    cb("cb38_links_offset", """
      SELECT URL, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND Refresh = 0 AND IsLink <> 0 AND IsDownload = 0
      GROUP BY URL ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 100"""),
    cb("cb39_src_dst", """
      SELECT TraficSourceID, SearchEngineID, AdvEngineID,
             CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END AS Src,
             URL AS Dst, COUNT(*) AS PageViews
      FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND Refresh = 0
      GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
      ORDER BY PageViews DESC, TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
      LIMIT 10 OFFSET 500"""),
    cb("cb40_urlhash_date", """
      SELECT URLHash, EventDate, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND Refresh = 0 AND TraficSourceID IN (-1, 3) AND RefererHash = 1115
      GROUP BY URLHash, EventDate ORDER BY PageViews DESC, URLHash, EventDate
      LIMIT 10 OFFSET 10"""),
    cb("cb41_window_size", """
      SELECT WindowClientWidth, WindowClientHeight, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31'
        AND Refresh = 0 AND DontCountHits = 0 AND URLHash = 4437
      GROUP BY WindowClientWidth, WindowClientHeight
      ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight
      LIMIT 10 OFFSET 5"""),
    cb("cb42_minute_series", """
      SELECT DATE_TRUNC('minute', EventTime) AS M, COUNT(*) AS PageViews FROM hits
      WHERE CounterID = 62 AND EventDate >= '2013-07-14' AND EventDate <= '2013-07-15'
        AND Refresh = 0 AND DontCountHits = 0
      GROUP BY DATE_TRUNC('minute', EventTime) ORDER BY M LIMIT 10 OFFSET 5""")
  )

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
        // scaled-long cents sum (see Tables.cents / g2); the fixture's
        // value column is 2-decimal, so the decimal(12,4) cast and the
        // cents path agree exactly
        .agg(count(lit(1)).as("n"),
          (sum(Tables.cents(col("value"))).cast("decimal(20,0)") / 100)
            .cast("decimal(18,4)").as("sv"))
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
        // cents-based exact avg (see Tables.cents / g2): same decimal
        // sum value, cast to double and divided exactly as avgDec
        .agg(count(lit(1)).as("n"),
          round(sum(Tables.cents(col("value"))).cast("double") / 100 / count(lit(1)), 6)
            .as("avg_value"))
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
          // scaled-long cents sum (see Tables.cents / g2)
          (sum(Tables.cents(col("value"))).cast("decimal(20,0)") / 100)
            .cast("decimal(18,4)").as("sv"))
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
  ) ++ cbQs
}
