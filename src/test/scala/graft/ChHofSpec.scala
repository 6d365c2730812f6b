package graft

import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse lambda combinators that need the ArrayAggregate fold
  * (the analyzer rejects non-HOF builder results for lambda calls). */
class ChHofSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def one(sql: String): Any = {
    graft.dialect.ChFunctions.register(spark)
    spark.sql(graft.dialect.Transpiler.transpile(sql)).collect().head.get(0)
  }

  test("arrayCount(lambda, arr) counts satisfying elements") {
    assert(one("SELECT arrayCount(x -> x % 2 = 0, array(1,2,3,4,5,6))") === 3L)
    assert(one("SELECT arrayCount(x -> x > 10, array(1,2,3))") === 0L)
  }

  test("arrayCount(arr) counts truthy (ClickHouse nonzero) elements") {
    assert(one("SELECT arrayCount(array(0, 1, 2, 0, 5))") === 3)
  }

  test("arraySum with and without lambda") {
    assert(one("SELECT arraySum(array(1, 2, 3))") === 6.0)
    assert(one("SELECT arraySum(x -> x * 2, array(1, 2, 3))") === 12.0)
  }

  test("ARRAY JOIN inside a subquery executes end-to-end (ADVICE r4)") {
    graft.dialect.ChFunctions.register(spark)
    val df = graft.dialect.Transpiler.sql(spark,
      """SELECT s.x FROM (
           SELECT x FROM (SELECT array(1, 2, 3) AS arr) t ARRAY JOIN arr AS x
         ) s ORDER BY s.x""")
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // multi-array zip in a subquery; first array bound once
    val zip = graft.dialect.Transpiler.sql(spark,
      """SELECT s.a, s.b FROM (
           SELECT a, b FROM (SELECT array(1, 2) AS xs, array(10, 20) AS ys) t
           ARRAY JOIN xs AS a, ys AS b
         ) s ORDER BY s.a""")
    assert(zip.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((1, 10), (2, 20)))
  }

  test("Play kitchen-sink query runs end-to-end (index.html:729)") {
    graft.dialect.ChFunctions.register(spark)
    val df = graft.dialect.Transpiler.sql(spark,
      """SELECT number, toString(number) AS str,
               number % 2 ? number : NULL AS nullable,
               range(number) AS arr,
               CAST((['hello', 'world'], [number, number % 2]) AS Map(String, UInt64)) AS map
         FROM numbers(10)""")
    val rows = df.orderBy("number").collect()
    assert(rows.length === 10)
    assert(rows(2).isNullAt(2) && rows(3).getLong(2) === 3L)
    assert(rows(3).getSeq[Long](3) === Seq(0L, 1L, 2L))
    val m = rows(3).getMap[String, java.math.BigDecimal](4)
    assert(m("hello").longValue === 3L && m("world").longValue === 1L)
  }

  test("intHash32/intHash64: SQL path matches the algorithm, sane range/distribution") {
    graft.dialect.ChFunctions.register(spark)
    val rows = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT number, intHash32(number) AS h32, intHash64(number) AS h64 FROM numbers(1000)"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === graft.functions.IntHash.intHash32(r.getLong(0)))
      assert(r.getLong(2) === graft.functions.IntHash.intHash64(r.getLong(0)))
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 0xffffffffL)
    }
    assert(rows.map(_.getLong(1)).distinct.length === 1000)
    assert(rows.map(_.getLong(2)).distinct.length === 1000)
  }

  test("uniqState/uniqMerge: HLL sketches merge across groups") {
    graft.dialect.ChFunctions.register(spark)
    val est = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT uniqMerge(st) AS u FROM (
           SELECT number % 7 AS g, uniqState(number) AS st
           FROM numbers(5000) GROUP BY g)"""))
      .collect().head.getLong(0)
    // DataSketches HLL at default lgK=12 is well within 2% at n=5000
    assert(math.abs(est - 5000L) <= 100L, s"estimate $est")
  }

  test("exact -State/-Merge equals one-shot aggregation") {
    graft.dialect.ChFunctions.register(spark)
    val merged = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT countMerge(cs) AS n, sumMerge(ss) AS s FROM (
           SELECT number % 5 AS g, countState() AS cs, sumState(number) AS ss
           FROM numbers(1000) GROUP BY g)"""))
      .collect().head
    assert(merged.getLong(0) === 1000L && merged.getLong(1) === 499500L)
  }

  test("topK: exact when cardinality fits; heavy hitter survives overflow") {
    graft.dialect.ChFunctions.register(spark)
    // small cardinality -> exact, ordered by count desc then value
    val exact = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT topK(2)(CASE WHEN number % 10 < 6 THEN 'a'
                             WHEN number % 10 < 9 THEN 'b' ELSE 'c' END) AS t
         FROM numbers(1000)""")).collect().head.getSeq[String](0)
    assert(exact === Seq("a", "b"))
    // 500 distinct values + one value at 30% frequency: the sketch
    // overflows its 512-entry capacity but the heavy hitter must survive
    val skew = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT topK(1)(CASE WHEN number % 10 < 3 THEN 'HOT'
                             ELSE toString(number % 5000) END) AS t
         FROM numbers(20000)""")).collect().head.getSeq[String](0)
    assert(skew === Seq("HOT"))
    // result preserves the argument's type (ClickHouse contract)
    val nums = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT topK(2)(number % 4) AS t
         FROM numbers(100) WHERE number % 4 <= 1""")).collect().head.getSeq[Long](0)
    assert(nums.toSet === Set(0L, 1L))
  }

  test("multi-search / substring-count / replace family") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT positionCaseInsensitive('Hello World', 'world') AS p,
                countSubstrings('abcabcabc', 'bc') AS c,
                multiSearchAny('haystack', ['zz', 'stack']) AS any1,
                multiSearchAny('haystack', ['zz', 'qq']) AS any0,
                replaceOne('aXbXc', 'X', '-') AS r1,
                replaceAll('aXbXc', 'X', '-') AS ra""")).collect().head
    assert(r.getInt(0) === 7 && r.getLong(1) === 3L)
    assert(r.getBoolean(2) === true && r.getBoolean(3) === false)
    assert(r.getString(4) === "a-bXc" && r.getString(5) === "a-b-c")
  }

  test("array helpers: reverse/slice/zip/enumerate/hasAny/hasAll") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT arrayStringConcat(arrayReverse(array(1,2,3)), ',') AS rev,
                arrayStringConcat(arraySlice(array(1,2,3,4,5), 2, 2), ',') AS sl,
                arrayStringConcat(arraySlice(array(1,2,3,4,5), 3), ',') AS sl2,
                arrayStringConcat(arrayEnumerate(array(9,9,9)), ',') AS en,
                hasAny(array(1,2), array(2,3)) AS ha,
                hasAll(array(1,2,3), array(1,3)) AS hall,
                hasAll(array(1,2), array(1,9)) AS hnot""")).collect().head
    assert(r.getString(0) === "3,2,1" && r.getString(1) === "2,3")
    assert(r.getString(2) === "3,4,5" && r.getString(3) === "1,2,3")
    assert(r.getBoolean(4) && r.getBoolean(5) && !r.getBoolean(6))
  }

  test("splitByString and alphaTokens") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT arrayStringConcat(splitByString('::', 'a::b::c'), ',') AS sp,
                arrayStringConcat(alphaTokens('ab12cd,ef'), ',') AS at"""))
      .collect().head
    assert(r.getString(0) === "a,b,c")
    assert(r.getString(1) === "ab,cd,ef")
  }

  test("GraftExtensions registers the dialect at session construction") {
    val orig = spark // ensure shared session (and its SparkContext) exist
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a static conf read at SparkContext
      // launch; in this shared-context JVM exercise the same hook via
      // withExtensions (what the conf invokes on a fresh cluster)
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val ym = s2.sql("SELECT toYYYYMM(CAST('2024-03-05' AS DATE)) AS ym")
        .collect().head.getInt(0)
      assert(ym === 202403)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
    }
  }

  test("arrayIntersect/arrayFlatten/arrayCompact") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT arrayStringConcat(arraySort(arrayIntersect(array(1,2,3), array(2,3,4))), ',') AS ai,
                arrayStringConcat(arrayFlatten(array(array(1,2), array(3))), ',') AS fl,
                arrayStringConcat(arrayCompact(array(1,1,2,2,2,1,3,3)), ',') AS ac""")).collect().head
    assert(r.getString(0) === "2,3")
    assert(r.getString(1) === "1,2,3")
    assert(r.getString(2) === "1,2,1,3")
  }

  test("bit functions and unix-time conversions") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT bitAnd(12, 10) AS ba, bitOr(12, 10) AS bo, bitXor(12, 10) AS bx,
                bitShiftLeft(1, 4) AS sl, bitShiftRight(16, 2) AS sr,
                bitTest(5, 0) AS bt1, bitTest(5, 1) AS bt0,
                exp2(10) AS e2, intExp2(10) AS ie2,
                toUnixTimestamp(toDateTime('1970-01-02 00:00:00')) AS ut,
                groupBitOr(number) AS gbo
         FROM numbers(8)""")).collect().head
    assert(r.getInt(0) === 8 && r.getInt(1) === 14 && r.getInt(2) === 6)
    assert(r.getInt(3) === 16 && r.getInt(4) === 4)
    assert(r.getShort(5) === 1.toShort && r.getShort(6) === 0.toShort)
    assert(r.getDouble(7) === 1024.0 && r.getLong(8) === 1024L)
    assert(r.getLong(9) === 86400L)
    assert(r.getLong(10) === 7L)
  }

  test("quantiles (plural) and median") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT quantiles(0.25, 0.75)(number) AS qs, median(number) AS med
         FROM numbers(101)""")).collect().head
    assert(r.getSeq[Double](0) === Seq(25.0, 75.0))
    assert(r.getDouble(1) === 50.0)
  }

  test("EXPLAIN kinds: SYNTAX/PLAN/PIPELINE/AST/ESTIMATE each show their layer") {
    graft.dialect.ChContext.setup(spark, "/root/testdata/sf0.001")
    def explain(sql: String): String = graft.dialect.Engine.execute(spark, sql)
      .collect().map(_.getString(0)).mkString("\n")
    // SYNTAX = the dialect rewrite (CH returns the rewritten query)
    val syn = explain("EXPLAIN SYNTAX SELECT count() FROM nation")
    assert(syn.toLowerCase.contains("count(*)"), syn)
    // default / PLAN = optimized logical plan
    val plan = explain("EXPLAIN SELECT count() FROM nation")
    assert(plan.contains("Aggregate"), plan)
    assert(explain("EXPLAIN PLAN SELECT count() FROM nation")
      .contains("Aggregate"))
    // PIPELINE = formatted physical plan, the execution pipeline
    val pipe = explain("EXPLAIN PIPELINE SELECT count() FROM nation")
    assert(pipe.contains("HashAggregate") && pipe.contains("(1) Scan"), pipe)
    // AST = analyzed plan (pre-optimization; still shows the scan)
    val ast = explain("EXPLAIN AST SELECT count() FROM nation")
    assert(ast.contains("Aggregate"), ast)
    // ESTIMATE = Catalyst cost columns
    val est = graft.dialect.Engine.execute(spark,
      "EXPLAIN ESTIMATE SELECT count() FROM nation")
    assert(est.columns.toSeq === Seq("size_bytes", "rows"))
    assert(est.collect().head.getString(0).toLong > 0)
    // the explained query runs through the full dialect path
    val asof = explain(
      "EXPLAIN PIPELINE SELECT count() FROM events AS l ASOF JOIN events AS r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts")
    assert(asof.nonEmpty)
  }

  test("URL function family parses protocol/domain/path/params") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT protocol(u) AS pr, domain(u) AS d, domainWithoutWWW(u) AS dw,
                topLevelDomain(u) AS tld, path(u) AS p,
                queryString(u) AS qs, extractURLParameter(u, 'q') AS qp
         FROM (SELECT 'https://www.example.com/search/deep?q=spark&n=10' AS u)"""))
      .collect().head
    assert(r.getString(0) === "https" && r.getString(1) === "www.example.com")
    assert(r.getString(2) === "example.com" && r.getString(3) === "com")
    assert(r.getString(4) === "/search/deep")
    assert(r.getString(5) === "q=spark&n=10" && r.getString(6) === "spark")
  }

  test("tuple/tupleElement construct and extract") {
    assert(one("SELECT tupleElement(tuple(7, 'x'), 2)") === "x")
    assert(one("SELECT tupleElement(tuple(7, 'x'), 1)") === 7)
  }

  test("arrayCount lambda referencing an outer column") {
    graft.dialect.ChFunctions.register(spark)
    val rows = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT number, arrayCount(x -> x >= number, range(5)) AS n
         FROM numbers(3) ORDER BY number"""))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((0L, 5L), (1L, 4L), (2L, 3L)))
  }

  test("arrayEnumerateDense/Uniq number duplicates the ClickHouse way") {
    // dense: ids in first-appearance order; uniq: per-value occurrence #
    assert(one("SELECT toString(arrayEnumerateDense([10,20,10,30]))")
      === "[1, 2, 1, 3]")
    assert(one("SELECT toString(arrayEnumerateUniq([10,20,10,10]))")
      === "[1, 1, 2, 3]")
  }

  test("arrayFirst/arrayLast/arrayFirstIndex take the lambda first") {
    assert(one("SELECT arrayFirst(x -> x > 2, [1,2,3,4])") === 3)
    assert(one("SELECT arrayLast(x -> x > 2, [1,2,3,4])") === 4)
    assert(one("SELECT arrayFirstIndex(x -> x > 2, [1,2,3,4])") === 3L)
    assert(one("SELECT arrayFirstIndex(x -> x > 9, [1,2,3,4])") === 0L)
  }

  test("float classification: isNaN/isInfinite/isFinite") {
    assert(one("SELECT isNaN(sqrt(-1))") === true)
    assert(one("SELECT isInfinite(toFloat64OrNull('Infinity'))") === true)
    assert(one("SELECT isFinite(1.5)") === true)
    assert(one("SELECT isFinite(toFloat64OrNull('-Infinity'))") === false)
  }

  test("toStartOfWeek mode 1 is Monday; default mode is Sunday") {
    // 2024-03-06 is a Wednesday
    assert(one("SELECT toString(toStartOfWeek(toDate('2024-03-06'), 1))")
      === "2024-03-04")
    assert(one("SELECT toString(toStartOfWeek(toDate('2024-03-06')))")
      === "2024-03-03")
  }

  test("roundBankers rounds half to even") {
    assert(one("SELECT roundBankers(2.5)") === 2.0d)
    assert(one("SELECT roundBankers(3.5)") === 4.0d)
    assert(one("SELECT roundBankers(2.345, 2)") === 2.34d)
  }

  test("select aliases resolve in WHERE and HAVING (ClickHouse scoping)") {
    graft.dialect.ChFunctions.register(spark)
    import graft.dialect.Engine
    val w = Engine.execute(spark, """
      SELECT number + 10 AS y FROM numbers(5) WHERE y >= 12 ORDER BY y""")
      .collect().map(_.getLong(0))
    assert(w.toSeq === Seq(12L, 13L, 14L))
    val h = Engine.execute(spark, """
      SELECT number % 2 AS g, sum(number) AS s FROM numbers(10)
      GROUP BY g HAVING s > 20 ORDER BY g""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.toSeq === Seq((1L, 25L)))
    // strings containing the alias name stay untouched
    val lit = Engine.execute(spark, """
      SELECT number * 2 AS d, 'd marks' AS tag FROM numbers(3)
      WHERE d = 4""").collect()
    assert(lit.length === 1 && lit.head.getString(1) === "d marks")
  }

  test("bare ARRAY JOIN explodes a column and qualifies its references") {
    graft.dialect.ChFunctions.register(spark)
    val rows = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT arr, arr * 2 AS d
         FROM (SELECT array(1, 2, 3) AS arr) t ARRAY JOIN arr
         WHERE arr > 1 ORDER BY arr"""))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq === Seq((2, 4), (3, 6)))
  }

  test("bare ARRAY JOIN on a Nested prefix zips the parallel arrays") {
    graft.dialect.ChFunctions.register(spark)
    graft.dialect.Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_aj")
    graft.dialect.Engine.execute(spark, "DROP TABLE IF EXISTS graft_aj.nt")
    graft.dialect.Engine.execute(spark, """
      CREATE TABLE graft_aj.nt (id Int64,
        pp Nested(k String, v Int64)) ENGINE=Memory""")
    graft.dialect.Engine.execute(spark, """
      INSERT INTO graft_aj.nt SELECT 1, array('a', 'b'), array(10, 20)""")
    val rows = graft.dialect.Engine.execute(spark, """
      SELECT id, pp.k AS k, pp.v AS v FROM graft_aj.nt ARRAY JOIN pp
      ORDER BY v""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, "a", 10L), (1L, "b", 20L)))
  }

  test("greatCircleDistance matches a known city pair within 0.5%") {
    graft.dialect.ChFunctions.register(spark)
    // Paris (2.3522, 48.8566) -> Berlin (13.4050, 52.5200): ~877.46 km
    val d = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT greatCircleDistance(2.3522, 48.8566, 13.4050, 52.5200)"))
      .collect().head.getDouble(0)
    assert(math.abs(d - 877460) / 877460 < 0.005, s"d=$d")
  }

  test("rand()/rand64() produce in-range varying integers") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT rand() AS a, rand64() AS b FROM numbers(100)"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.forall { case (a, _) => a >= 0L && a < 4294967296L })
    assert(r.map(_._1).distinct.length > 50) // varies per row
    assert(r.map(_._2).distinct.length > 50)
    // rand64 fills all 64 bits: low 32 bits vary (a single double draw
    // only reaches ~2^53 coarse values, leaving low bits degenerate)
    val low = r.map(_._2 & 0xffffffffL).distinct
    assert(low.length > 50, s"low 32 bits degenerate: ${low.length} distinct")
    // and extremes are not saturated pile-ups at Long.MaxValue/MinValue
    assert(r.count(_._2 == Long.MaxValue) <= 1)
    assert(r.count(_._2 == Long.MinValue) <= 1)
  }

  test("formatReadableSize/Quantity render the published output shapes") {
    graft.dialect.ChFunctions.register(spark)
    def one(sql: String): String = spark.sql(
      graft.dialect.Transpiler.transpile(sql)).collect().head.getString(0)
    assert(one("SELECT formatReadableSize(1)") === "1.00 B")
    assert(one("SELECT formatReadableSize(1024)") === "1.00 KiB")
    assert(one("SELECT formatReadableSize(1045)") === "1.02 KiB")
    assert(one("SELECT formatReadableSize(1048576)") === "1.00 MiB")
    assert(one("SELECT formatReadableSize(1099511627776)") === "1.00 TiB")
    assert(one("SELECT formatReadableQuantity(123)") === "123.00")
    assert(one("SELECT formatReadableQuantity(1024)") === "1.02 thousand")
    assert(one("SELECT formatReadableQuantity(1234000)") === "1.23 million")
    assert(one("SELECT formatReadableQuantity(2500000000)") === "2.50 billion")
  }

  test("uniqTheta/uniqCombined64 approximate distinct like uniq") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT uniqTheta(number % 100) AS t, uniqCombined64(number % 100) AS c
         FROM numbers(10000)""")).collect().head
    assert(math.abs(r.getLong(0) - 100L) <= 5)
    assert(math.abs(r.getLong(1) - 100L) <= 5)
  }

  test("sipHash64 matches the SipHash-2-4 paper test vectors") {
    // reference vectors (Aumasson & Bernstein, public-domain impl):
    // key = 00..0f (k0/k1 little-endian), input = 00 01 .. (len-1)
    val k0 = 0x0706050403020100L
    val k1 = 0x0f0e0d0c0b0a0908L
    def in(len: Int) = Array.tabulate[Byte](len)(_.toByte)
    assert(graft.functions.SipHash.sipHash64Keyed(k0, k1, in(0))
      === 0x726fdb47dd0e0e31L)
    assert(graft.functions.SipHash.sipHash64Keyed(k0, k1, in(8))
      === 0x93f5f5799a932462L)
    assert(graft.functions.SipHash.sipHash64Keyed(k0, k1, in(15))
      === 0xa129ca6149be45e5L)
    // the SQL surface: zero-key variant, deterministic and non-trivial
    assert(one("SELECT sipHash64('a') != sipHash64('b')") === true)
    assert(one("SELECT sipHash64('graft') = sipHash64('graft')") === true)
    assert(one("SELECT sipHash64(toString(42)) = sipHash64('42')") === true)
  }

  test("sumMap sums values per key, result sorted by key") {
    graft.dialect.ChFunctions.register(spark)
    val r = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT toString(tupleElement(sumMap(k, v), 1)) AS ks,
                toString(tupleElement(sumMap(k, v), 2)) AS vs
         FROM (SELECT array('b', 'a') AS k, array(1, 2) AS v
               UNION ALL SELECT array('a', 'c'), array(10, 5))"""))
      .collect().head
    assert(r.getString(0) === "[a, b, c]")
    assert(r.getString(1) === "[12, 1, 5]")
    // fractional values widen to double
    val d = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT toString(tupleElement(sumMap(array(1), array(0.5)), 2))"))
      .collect().head.getString(0)
    assert(d === "[0.5]")
    // Int64 sums stay exact beyond 2^53 (Long accumulator, not Double:
    // 2^53 + 1 + 1 would round to 2^53 in a double intermediate)
    val big = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT toString(tupleElement(sumMap(k, v), 2)) AS s
         FROM (SELECT array('x') AS k, array(9007199254740992) AS v
               UNION ALL SELECT array('x'), array(1)
               UNION ALL SELECT array('x'), array(1))"""))
      .collect().head.getString(0)
    assert(big === "[9007199254740994]", s"lost precision: $big")
    // minMap / maxMap keep the extreme per key
    val mm = spark.sql(graft.dialect.Transpiler.transpile(
      """SELECT toString(tupleElement(minMap(k, v), 2)) AS mn,
                toString(tupleElement(maxMap(k, v), 2)) AS mx
         FROM (SELECT array('a') AS k, array(5) AS v
               UNION ALL SELECT array('a'), array(2))"""))
      .collect().head
    assert(mm.getString(0) === "[2]" && mm.getString(1) === "[5]")
  }

  test("kurtPop is population excess kurtosis") {
    // [1,2,3,4,5]: m2=2, m4=6.8 -> 6.8/4 - 3 = -1.3
    graft.dialect.ChFunctions.register(spark)
    val v = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT round(kurtPop(toFloat64(number + 1)), 6) AS k FROM numbers(5)"))
      .collect().head.getDouble(0)
    assert(v === -1.3d)
  }

  test("scalar tail: dateTrunc/toTypeName/UUID/URL-component functions") {
    graft.dialect.ChFunctions.register(spark)
    def one(sql: String): String = spark.sql(
      graft.dialect.Transpiler.transpile(sql)).collect().head.get(0).toString
    assert(one("SELECT dateTrunc('month', toDateTime('2024-05-17 10:30:00'))")
      .startsWith("2024-05-01 00:00:00"))
    assert(one("SELECT toTypeName(1)") === "Int32")
    assert(one("SELECT toTypeName(toFloat64(1))") === "Float64")
    assert(one("SELECT toTypeName('x')") === "String")
    assert(one("SELECT toTypeName([1, 2])") === "Array(Int32)")
    assert(one("SELECT generateUUIDv4()")
      .matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(one("SELECT encodeURLComponent('a b&c')") === "a+b%26c")
    assert(one("SELECT decodeURLComponent('a%20b%26c')") === "a b&c")
    assert(one("SELECT pathFull('https://ex.com/p/q?k=1#f')") === "/p/q?k=1")
    assert(one("SELECT pathFull('https://ex.com/p/q')") === "/p/q")
  }

  test("entropy aggregate: exact log2 value, partition-order independent") {
    graft.dialect.ChFunctions.register(spark)
    // 4 equi-probable values -> exactly 2 bits, however the rows split
    // across partitions (mergeable state, sorted-eval determinism)
    val vals = (0 until 64).map(i => i % 4)
    import spark.implicits._
    vals.toDF("x").repartition(7).createOrReplaceTempView("ent_t")
    val h = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT entropy(x) AS h FROM ent_t")).collect().head.getDouble(0)
    assert(h === 2.0d)
    // skewed: 3/4 vs 1/4 -> H = 2 - 0.75*log2(3) exactly
    val h2 = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT entropy(if(x = 0, 0, 1)) AS h FROM ent_t"))
      .collect().head.getDouble(0)
    val expect = 2.0 - 0.75 * (math.log(3) / math.log(2))
    assert(math.abs(h2 - expect) < 1e-12)
    // values whose string rendering exceeds writeUTF's 64 KiB cap must
    // survive the partial-aggregate shuffle (length-prefixed raw UTF-8)
    val big = (0 until 8).map(i => ("x" * 70000) + (i % 2))
    big.toDF("t").repartition(3).createOrReplaceTempView("ent_big")
    val h3 = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT entropy(t) AS h FROM ent_big")).collect().head.getDouble(0)
    assert(h3 === 1.0d)
  }

  test("vector family: known values, zero vectors, length-mismatch nulls") {
    graft.dialect.ChFunctions.register(spark)
    def one(sql: String) = spark.sql(graft.dialect.Transpiler.transpile(sql))
      .collect().head
    val r = one("""
      SELECT dotProduct([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]) AS dp,
             L2Norm([3.0, 4.0]) AS n2,
             L1Distance([1.0, 2.0], [4.0, 6.0]) AS d1,
             LinfDistance([1.0, 2.0], [4.0, 6.0]) AS dinf,
             cosineDistance([1.0, 0.0], [0.0, 1.0]) AS cd,
             arrayStringConcat(arrayMap(x -> toString(x),
               normalizeL2([3.0, 4.0])), ',') AS nz,
             arrayAUC([0.1, 0.4, 0.35, 0.8],
               [0, 0, 1, 1]) AS auc""")
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 7.0)
    assert(r.getDouble(3) === 4.0)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12) // orthogonal => 1
    assert(r.getString(5) === "0.6,0.8")
    assert(r.getDouble(6) === 0.75) // the canonical sklearn example
    // length mismatch: ZipWith pads with null, the fold propagates it —
    // a NULL result, not a silent wrong number
    val m = one("SELECT dotProduct([1.0, 2.0], [1.0]) AS dp")
    assert(m.isNullAt(0))
    // all-one-class labels: AUC undefined => NULL
    val a = one("SELECT arrayAUC([0.1, 0.2], [1, 1]) AS auc")
    assert(a.isNullAt(0))
    // mismatched lengths: an ERROR (ClickHouse BAD_ARGUMENTS), never a
    // silently-truncated metric
    intercept[Exception](one("SELECT arrayAUC([0.1, 0.2, 0.3], [1, 0]) AS auc"))
    // labels are positive only when > 0: a -1 label is a negative class
    val neg = one("SELECT arrayAUC([0.1, 0.4, 0.35, 0.8], [-1, -1, 1, 1]) AS auc")
    assert(neg.getDouble(0) === 0.75)
    // normalizeL2's norm must be HOISTED out of the per-element lambda
    // (With/common-subexpression), not recomputed per element — the
    // optimizer materializes it as a _common_expr projection
    val nzPlan = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT normalizeL2(array(number, number + 1)) AS z FROM numbers(4)"))
      .queryExecution.optimizedPlan.toString
    assert(nzPlan.contains("_common_expr"), nzPlan.take(2000))
  }

  test("arrayShuffle keeps the multiset; anyHeavy finds the majority value") {
    graft.dialect.ChFunctions.register(spark)
    val shuffled = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT arrayShuffle(range(20)) AS a")).collect().head.getSeq[Long](0)
    assert(shuffled.sorted === (0L until 20L))
    val heavy = spark.sql(graft.dialect.Transpiler.transpile(
      "SELECT anyHeavy(if(number % 2 = 0, 99, number)) AS m FROM numbers(40)"))
      .collect().head.getLong(0)
    assert(heavy === 99L)
  }
}
