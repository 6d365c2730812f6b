package graft.dialect

import org.apache.spark.sql.SparkSession

/** Synthetic ClickBench `hits` fixture (SURVEY.md §2 tier B).
  *
  * The reference's CI gate creates the 105-column ClickBench `hits`
  * table and loads the real 10M-row TSV before running the standard
  * 43-query sweep (/root/reference/.github/workflows/test.yml:48-61).
  * The real dataset isn't available here (zero egress), so this
  * fixture generates a deterministic synthetic `hits`:
  *
  *   - the CREATE TABLE is the reference's own DDL text (test.yml:49)
  *     — Nested expansion, PARTITION/ORDER/SAMPLE BY all go through
  *     [[Ddl.createTable]] exactly as a real client's would;
  *   - every column is a pure-arithmetic expression of the row number,
  *     written once and evaluated BOTH by Spark (INSERT INTO ...
  *     SELECT ... FROM numbers(N) through the dialect engine) and by
  *     DuckDB (a `WITH hits AS (...)` CTE prefixed onto each oracle) —
  *     integer add/multiply/modulo, lpad and || only, so the two engines produce
  *     bit-identical values;
  *   - N is prime (no avg() can land exactly on a 4-decimal rounding
  *     tie — see cb03) and sized so the July-2013/CounterID=62 slices
  *     the sweep filters on are non-trivially populated.
  *
  * Dates span 2013-06..08 so `PARTITION BY toYYYYMM(EventDate)` yields
  * three live partitions and the sweep's July range-filter actually
  * prunes (DdlSpec asserts PartitionFilters).
  */
object HitsFixture {

  /** Prime row count: avg(UserID) = sum/N can never sit exactly on a
    * 4-decimal rounding boundary (N prime > 2e4 can't divide
    * 2*10^4*sum unless it divides sum, which gives .0000 not .5), so
    * Spark's DECIMAL(24,4) HALF_UP average and DuckDB's
    * round(avg(),4) always agree. */
  val N = 299993

  val db = "clickbench"
  val table = "clickbench.hits"

  /** The reference CI's own DDL, verbatim
    * (/root/reference/.github/workflows/test.yml:49). */
  val ddl: String =
    """CREATE TABLE IF NOT EXISTS clickbench.hits (WatchID UInt64,  JavaEnable UInt8,  Title String,  GoodEvent Int16,  EventTime DateTime,  EventDate Date,  CounterID UInt32,  ClientIP UInt32,  ClientIP6 FixedString(16),  RegionID UInt32,  UserID UInt64,  CounterClass Int8,  OS UInt8,  UserAgent UInt8,  URL String,  Referer String,  URLDomain String,  RefererDomain String,  Refresh UInt8,  IsRobot UInt8,  RefererCategories Array(UInt16),  URLCategories Array(UInt16), URLRegions Array(UInt32),  RefererRegions Array(UInt32),  ResolutionWidth UInt16,  ResolutionHeight UInt16,  ResolutionDepth UInt8,  FlashMajor UInt8, FlashMinor UInt8,  FlashMinor2 String,  NetMajor UInt8,  NetMinor UInt8, UserAgentMajor UInt16,  UserAgentMinor FixedString(2),  CookieEnable UInt8, JavascriptEnable UInt8,  IsMobile UInt8,  MobilePhone UInt8,  MobilePhoneModel String,  Params String,  IPNetworkID UInt32,  TraficSourceID Int8, SearchEngineID UInt16,  SearchPhrase String,  AdvEngineID UInt8,  IsArtifical UInt8,  WindowClientWidth UInt16,  WindowClientHeight UInt16,  ClientTimeZone Int16,  ClientEventTime DateTime,  SilverlightVersion1 UInt8, SilverlightVersion2 UInt8,  SilverlightVersion3 UInt32,  SilverlightVersion4 UInt16,  PageCharset String,  CodeVersion UInt32,  IsLink UInt8,  IsDownload UInt8,  IsNotBounce UInt8,  FUniqID UInt64,  HID UInt32,  IsOldCounter UInt8, IsEvent UInt8,  IsParameter UInt8,  DontCountHits UInt8,  WithHash UInt8, HitColor FixedString(1),  UTCEventTime DateTime,  Age UInt8,  Sex UInt8,  Income UInt8,  Interests UInt16,  Robotness UInt8,  GeneralInterests Array(UInt16), RemoteIP UInt32,  RemoteIP6 FixedString(16),  WindowName Int32,  OpenerName Int32,  HistoryLength Int16,  BrowserLanguage FixedString(2),  BrowserCountry FixedString(2),  SocialNetwork String,  SocialAction String,  HTTPError UInt16, SendTiming Int32,  DNSTiming Int32,  ConnectTiming Int32,  ResponseStartTiming Int32,  ResponseEndTiming Int32,  FetchTiming Int32,  RedirectTiming Int32, DOMInteractiveTiming Int32,  DOMContentLoadedTiming Int32,  DOMCompleteTiming Int32,  LoadEventStartTiming Int32,  LoadEventEndTiming Int32, NSToDOMContentLoadedTiming Int32,  FirstPaintTiming Int32,  RedirectCount Int8, SocialSourceNetworkID UInt8,  SocialSourcePage String,  ParamPrice Int64, ParamOrderID String,  ParamCurrency FixedString(3),  ParamCurrencyID UInt16, GoalsReached Array(UInt32),  OpenstatServiceName String,  OpenstatCampaignID String,  OpenstatAdID String,  OpenstatSourceID String,  UTMSource String, UTMMedium String,  UTMCampaign String,  UTMContent String,  UTMTerm String, FromTag String,  HasGCLID UInt8,  RefererHash UInt64,  URLHash UInt64,  CLID UInt32,  YCLID UInt64,  ShareService String,  ShareURL String,  ShareTitle String,  ParsedParams Nested(Key1 String,  Key2 String, Key3 String, Key4 String, Key5 String,  ValueDouble Float64),  IslandID FixedString(16),  RequestNum UInt32,  RequestTry UInt8) ENGINE = MergeTree() PARTITION BY toYYYYMM(EventDate) ORDER BY (CounterID, EventDate, intHash32(UserID)) SAMPLE BY intHash32(UserID) SETTINGS index_granularity = 8192"""

  /** One generator: identical SQL for both engines unless the dialects
    * force a split (array literals, CAST type names). */
  private final case class Gen(spark: String, duck: String)

  /** Shared text; `@STR@` becomes STRING (Spark) / VARCHAR (DuckDB). */
  private def g(e: String): Gen =
    Gen(e.replace("@STR@", "STRING"), e.replace("@STR@", "VARCHAR"))
  /** Array literal: Spark array(...), DuckDB [...]. */
  private def arr(inner: String*): Gen =
    Gen(s"array(${inner.mkString(", ")})",
        if (inner.isEmpty) "[]" else s"[${inner.mkString(", ")}]")

  // date parts: months 2013-06..08 (three live toYYYYMM partitions),
  // 28 days, h/m/s decorrelated by coprime multipliers
  private val dayStr =
    "'2013-0' || CAST(6 + (number % 3) AS @STR@) || '-' || " +
      "lpad(CAST(1 + (number % 28) AS @STR@), 2, '0')"
  private val timeStr = dayStr +
    " || ' ' || lpad(CAST(number % 24 AS @STR@), 2, '0')" +
    " || ':' || lpad(CAST((number * 7) % 60 AS @STR@), 2, '0')" +
    " || ':' || lpad(CAST((number * 13) % 60 AS @STR@), 2, '0')"
  private val dateExpr = s"CAST($dayStr AS DATE)"
  private val timeExpr = s"CAST($timeStr AS TIMESTAMP)"

  /** Generator per physical column, in DDL order (Nested expanded to
    * its parallel-array columns, matching [[Ddl.createTable]]). All
    * integer values stay within both the mapped Spark type and 10
    * significant digits (the driver compares floats via "%.10g"). */
  private val cols: Seq[(String, Gen)] = Seq(
    "WatchID" -> g("900000000 + number"), // unique, 9 digits
    "JavaEnable" -> g("number % 2"),
    // ~1/13 of titles mention Google (cb22), ~1/11 empty
    "Title" -> g("CASE WHEN number % 13 = 3 THEN 'Google Search ' || CAST(number % 50 AS @STR@) " +
      "WHEN number % 11 = 0 THEN '' ELSE 'Title ' || CAST((number * 31) % 1000 AS @STR@) END"),
    "GoodEvent" -> g("1"),
    "EventTime" -> g(timeExpr),
    "EventDate" -> g(dateExpr),
    "CounterID" -> g("40 + (number % 23)"), // 62 = the sweep's hot counter
    "ClientIP" -> g("(number * 101) % 16777216"),
    "ClientIP6" -> g("lpad(CAST((number * 7) % 65536 AS @STR@), 16, '0')"),
    "RegionID" -> g("(number * 17) % 31"),
    "UserID" -> g("100000 + ((number * 2654435761) % 9973)"), // ~10k users
    "CounterClass" -> g("number % 3"),
    "OS" -> g("(number * 3) % 9"),
    "UserAgent" -> g("(number * 5) % 7"),
    // 2/5 of URLs contain 'google' (cb20); path id ties to URLHash
    "URL" -> g("'http://' || CASE (number % 5) WHEN 0 THEN 'google.com' WHEN 1 THEN 'www.google.com' " +
      "WHEN 2 THEN 'example.com' WHEN 3 THEN 'yandex.ru' ELSE 'github.com' END || " +
      "'/p/' || CAST((number % 23) * 200 + (number % 200) AS @STR@)"),
    // 4 referer domains for the cb28 regexp-extract; ~1/7 empty
    "Referer" -> g("CASE WHEN number % 7 = 0 THEN '' ELSE 'http://' || " +
      "CASE ((number * 3) % 4) WHEN 0 THEN 'www.bing.com' WHEN 1 THEN 'google.com' " +
      "WHEN 2 THEN 'duckdb.org' ELSE 'spark.apache.org' END || '/r/' || CAST(number % 1000 AS @STR@) END"),
    "URLDomain" -> g("''"),
    "RefererDomain" -> g("''"),
    "Refresh" -> g("CASE WHEN number % 10 = 0 THEN 1 ELSE 0 END"),
    "IsRobot" -> g("0"),
    "RefererCategories" -> arr("number % 10", "(number * 3) % 10"),
    "URLCategories" -> arr(),
    "URLRegions" -> arr(),
    "RefererRegions" -> arr(),
    "ResolutionWidth" -> g("800 + (number % 7) * 100"),
    "ResolutionHeight" -> g("600 + (number % 5) * 100"),
    "ResolutionDepth" -> g("24"),
    "FlashMajor" -> g("11"),
    "FlashMinor" -> g("2"),
    "FlashMinor2" -> g("''"),
    "NetMajor" -> g("0"),
    "NetMinor" -> g("0"),
    "UserAgentMajor" -> g("(number * 11) % 100"),
    "UserAgentMinor" -> g("'aa'"),
    "CookieEnable" -> g("1"),
    "JavascriptEnable" -> g("1"),
    "IsMobile" -> g("CASE WHEN number % 4 = 0 THEN 1 ELSE 0 END"),
    "MobilePhone" -> g("(number * 13) % 6"),
    "MobilePhoneModel" -> g("CASE WHEN number % 4 = 0 THEN " +
      "CASE ((number * 7) % 5) WHEN 0 THEN 'iPhone' WHEN 1 THEN 'Pixel' WHEN 2 THEN 'Galaxy' " +
      "WHEN 3 THEN 'Nokia' ELSE 'Xiaomi' END ELSE '' END"),
    "Params" -> g("''"),
    "IPNetworkID" -> g("(number * 19) % 5000"),
    "TraficSourceID" -> g("(number % 5) - 1"), // -1..3
    "SearchEngineID" -> g("(number * 3) % 6"),
    "SearchPhrase" -> g("CASE WHEN number % 3 = 0 THEN 'search ' || CAST((number * 37) % 500 AS @STR@) ELSE '' END"),
    "AdvEngineID" -> g("CASE WHEN (number * 7) % 20 = 0 THEN 1 + ((number * 11) % 5) ELSE 0 END"),
    "IsArtifical" -> g("0"),
    "WindowClientWidth" -> g("100 * (number % 7) + 50"),
    "WindowClientHeight" -> g("50 * (number % 11) + 40"),
    "ClientTimeZone" -> g("(number % 25) - 12"),
    "ClientEventTime" -> g(timeExpr),
    "SilverlightVersion1" -> g("0"),
    "SilverlightVersion2" -> g("0"),
    "SilverlightVersion3" -> g("0"),
    "SilverlightVersion4" -> g("0"),
    "PageCharset" -> g("'utf-8'"),
    "CodeVersion" -> g("1"),
    // % 7, coprime to the month cycle (% 3): an IsLink filter composed
    // with a July range-filter must stay satisfiable (cb38)
    "IsLink" -> g("CASE WHEN number % 7 = 2 THEN 1 ELSE 0 END"),
    "IsDownload" -> g("CASE WHEN number % 50 = 0 THEN 1 ELSE 0 END"),
    "IsNotBounce" -> g("0"),
    "FUniqID" -> g("number"),
    "HID" -> g("(number * 23) % 100000"),
    "IsOldCounter" -> g("0"),
    "IsEvent" -> g("0"),
    "IsParameter" -> g("0"),
    "DontCountHits" -> g("CASE WHEN number % 17 = 0 THEN 1 ELSE 0 END"),
    "WithHash" -> g("0"),
    "HitColor" -> g("CASE (number % 3) WHEN 0 THEN 'w' WHEN 1 THEN 'g' ELSE 'h' END"),
    "UTCEventTime" -> g(timeExpr),
    "Age" -> g("(number * 3) % 80"),
    "Sex" -> g("number % 2"),
    "Income" -> g("(number * 7) % 4"),
    "Interests" -> g("(number * 29) % 1000"),
    "Robotness" -> g("0"),
    "GeneralInterests" -> arr(),
    "RemoteIP" -> g("(number * 271) % 16777216"),
    "RemoteIP6" -> g("''"),
    "WindowName" -> g("(number % 100) - 1"),
    "OpenerName" -> g("-1"),
    "HistoryLength" -> g("number % 30"),
    "BrowserLanguage" -> g("CASE (number % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'ru' WHEN 2 THEN 'de' ELSE 'fr' END"),
    "BrowserCountry" -> g("CASE (number % 4) WHEN 0 THEN 'us' WHEN 1 THEN 'ru' WHEN 2 THEN 'de' ELSE 'fr' END"),
    "SocialNetwork" -> g("''"),
    "SocialAction" -> g("''"),
    "HTTPError" -> g("CASE WHEN number % 100 = 0 THEN 404 ELSE 0 END"),
    "SendTiming" -> g("(number * 3) % 1000"),
    "DNSTiming" -> g("(number * 5) % 300"),
    "ConnectTiming" -> g("(number * 7) % 500"),
    "ResponseStartTiming" -> g("(number * 11) % 2000"),
    "ResponseEndTiming" -> g("(number * 13) % 3000"),
    "FetchTiming" -> g("(number * 17) % 4000"),
    "RedirectTiming" -> g("0"),
    "DOMInteractiveTiming" -> g("0"),
    "DOMContentLoadedTiming" -> g("0"),
    "DOMCompleteTiming" -> g("0"),
    "LoadEventStartTiming" -> g("0"),
    "LoadEventEndTiming" -> g("0"),
    "NSToDOMContentLoadedTiming" -> g("0"),
    "FirstPaintTiming" -> g("0"),
    "RedirectCount" -> g("0"),
    "SocialSourceNetworkID" -> g("0"),
    "SocialSourcePage" -> g("''"),
    "ParamPrice" -> g("(number * 997) % 100000"),
    "ParamOrderID" -> g("''"),
    "ParamCurrency" -> g("'USD'"),
    "ParamCurrencyID" -> g("840"),
    "GoalsReached" -> arr(),
    "OpenstatServiceName" -> g("''"),
    "OpenstatCampaignID" -> g("''"),
    "OpenstatAdID" -> g("''"),
    "OpenstatSourceID" -> g("''"),
    "UTMSource" -> g("''"),
    "UTMMedium" -> g("''"),
    "UTMCampaign" -> g("''"),
    "UTMContent" -> g("''"),
    "UTMTerm" -> g("''"),
    "FromTag" -> g("''"),
    "HasGCLID" -> g("0"),
    "RefererHash" -> g("(number % 23) * 50 + (number % 50)"),
    "URLHash" -> g("(number % 23) * 200 + (number % 200)"), // = URL path id
    "CLID" -> g("0"),
    "YCLID" -> g("0"),
    "ShareService" -> g("''"),
    "ShareURL" -> g("''"),
    "ShareTitle" -> g("''"),
    "ParsedParams.Key1" -> {
      val k = "'k' || CAST(number % 5 AS @STR@)"
      Gen(s"array(${k.replace("@STR@", "STRING")})", s"[${k.replace("@STR@", "VARCHAR")}]")
    },
    "ParsedParams.Key2" -> arr(),
    "ParsedParams.Key3" -> arr(),
    "ParsedParams.Key4" -> arr(),
    "ParsedParams.Key5" -> arr(),
    "ParsedParams.ValueDouble" -> arr("CAST(number % 100 AS DOUBLE)"),
    "IslandID" -> g("''"),
    "RequestNum" -> g("number % 1000"),
    "RequestTry" -> g("0")
  )

  /** Physical column names in DDL order (spec alignment check). */
  def columnNames: Seq[String] = cols.map(_._1)

  /** UInt64-typed DDL columns. Spark maps UInt64 → DECIMAL(20,0) and
    * Verify casts result decimals to double for the driver compare, so
    * the DuckDB twin produces DOUBLE for these outright (values stay
    * ≤ 10 significant digits — exact in binary64). */
  private val u64 = Set("WatchID", "UserID", "FUniqID", "RefererHash",
    "URLHash", "YCLID")

  private val arrayCols = Set("RefererCategories", "URLCategories",
    "URLRegions", "RefererRegions", "GeneralInterests", "GoalsReached",
    "ParsedParams.Key1", "ParsedParams.Key2", "ParsedParams.Key3",
    "ParsedParams.Key4", "ParsedParams.Key5", "ParsedParams.ValueDouble")

  /** cb23's `SELECT *` with list cells serialized: the driver compare
    * sorts result rows, which raw array cells break (unhashable in
    * pandas) — ClickHouse's own TSV output renders arrays as text at
    * this boundary too. Returns (spark projection, duck projection)
    * over every physical column incl. `_part`. */
  def starProjections: (String, String) = {
    val names = columnNames :+ "_part"
    val spark = names.map { n =>
      if (arrayCols(n))
        s"array_join(transform(`$n`, x -> cast(x AS STRING)), ',') AS `$n`"
      else s"`$n`"
    }
    val duck = names.map { n =>
      // COALESCE: DuckDB's array_to_string is NULL on the empty list
      // where Spark's array_join is ''
      if (arrayCols(n)) s"""COALESCE(array_to_string("$n", ','), '') AS "$n""""
      else s""""$n""""
    }
    (spark.mkString(", "), duck.mkString(", "))
  }

  /** The bulk load, via the same dialect path a client uses. */
  def insertSql: String = insertSqlFor(table, N)

  private def insertSqlFor(tbl: String, n: Int): String =
    s"INSERT INTO $tbl SELECT\n${cols.map(_._2.spark).mkString(",\n")}\nFROM numbers($n)"

  /** Slice variant for chunked loads: numbers(offset, count) keeps
    * `number` globally consistent, so the union of chunks is
    * row-identical to one numbers(n) insert. */
  private def insertSliceSql(tbl: String, offset: Long, count: Long): String =
    s"INSERT INTO $tbl SELECT\n${cols.map(_._2.spark).mkString(",\n")}\nFROM numbers($offset, $count)"

  /** Rows per load chunk. The MergeTree INSERT path shuffles its input
    * on `_part`; one 300M-row insert writes ~130 GB of shuffle blocks
    * and dies on this sandbox's ~80 GB /tmp. 50M-row chunks bound the
    * live shuffle footprint at ~22 GB regardless of total size — the
    * same batched-ingest shape a production loader uses, at any scale. */
  private[graft] var LoadChunk: Long = 50L * 1000 * 1000

  /** DuckDB twin of the table (incl. the materialized `_part`
    * partition column) — prefixed onto every sweep oracle so the
    * driver's DuckDB reproduces the identical rows from nothing. */
  def duckHits: String = {
    val exprs = cols.map { case (n, gg) =>
      val e = if (u64(n)) s"CAST(${gg.duck} AS DOUBLE)" else gg.duck
      s"""$e AS "$n""""
    } :+ "CAST(201306 + (number % 3) AS INT) AS _part"
    s"(SELECT ${exprs.mkString(", ")} FROM range($N) t(number))"
  }

  def oracle(q: String): String = s"WITH hits AS ${duckHits}\n${q.stripMargin.trim}"

  @volatile private var ready = false

  /** Create + load once per JVM (idempotent; re-registers the `hits`
    * temp view for the session). The generated table is ~300k rows ×
    * 111 columns, parquet-partitioned on `_part` (three months). */
  def ensure(spark: SparkSession): Unit = synchronized {
    ChFunctions.register(spark)
    if (!ready) {
      Engine.execute(spark, s"CREATE DATABASE IF NOT EXISTS $db")
      val loaded =
        try spark.catalog.tableExists(table) && spark.table(table).count() == N
        catch { case _: Throwable => false }
      if (!loaded) {
        Engine.execute(spark, s"DROP TABLE IF EXISTS $table SYNC")
        Engine.execute(spark, ddl)
        Engine.execute(spark, insertSql)
      }
      ready = true
    }
    if (!spark.catalog.tableExists("hits"))
      spark.table(table).createOrReplaceTempView("hits")
  }

  /** Bench-scale prime row counts (same no-rounding-tie argument as
    * [[N]]): ~10× the correctness fixture, the scale VERDICT r7 asked
    * the sweep to be timed at. */
  val BenchN = 2999999

  /** Build the same fixture at `n` rows as `clickbench.hits_bench` and
    * point the `hits` view at it — the bench twin of [[ensure]] (same
    * DDL text, same generators, same INSERT...SELECT dialect path, so
    * partitioning/ORDER BY clustering match what a real client's load
    * would produce). Persisted in the warehouse across JVMs; rebuilt
    * only when the stored row count differs. Marks the fixture ready so
    * a subsequent [[ensure]] (from the query entries) keeps the bench
    * view. */
  def ensureScaled(spark: SparkSession, n: Int = BenchN): Unit = synchronized {
    ChFunctions.register(spark)
    val tbl = s"$db.hits_bench"
    Engine.execute(spark, s"CREATE DATABASE IF NOT EXISTS $db")
    val loaded =
      try spark.catalog.tableExists(tbl) && spark.table(tbl).count() == n
      catch { case _: Throwable => false }
    if (!loaded) {
      Engine.execute(spark, s"DROP TABLE IF EXISTS $tbl SYNC")
      Engine.execute(spark, ddl.replace(table, tbl))
      var off = 0L
      while (off < n) {
        val cnt = math.min(LoadChunk, n - off)
        Engine.execute(spark, insertSliceSql(tbl, off, cnt))
        off += cnt
      }
    }
    spark.table(tbl).createOrReplaceTempView("hits")
    ready = true
  }

  /** Undo [[ensureScaled]] for test isolation: drop the `hits` view so
    * the next [[ensure]] re-registers the correctness-scale table. */
  private[graft] def reset(spark: SparkSession): Unit = synchronized {
    spark.catalog.dropTempView("hits")
    ready = false
  }
}
