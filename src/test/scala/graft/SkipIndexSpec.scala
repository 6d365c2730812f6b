package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}
import graft.plans.SkipIndexPrune

/** Data-skipping indexes (SkipIndexes + SkipIndexPrune): per-file stats
  * manifests that drop files a predicate cannot match — the engine's
  * answer to ClickHouse `ADD INDEX ... TYPE minmax|set(n)|bloom_filter`.
  * Each test loads batches with disjoint value ranges (separate INSERTs
  * = separate files), indexes a NON-sort, NON-partition column, and
  * asserts both halves of the contract: fewer files reach the scan, and
  * the rows that come back are exactly the unpruned result. */
class SkipIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** files listed by the (possibly pruned) scan of the query plan */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }.sum

  private def mk(table: String, batches: Seq[(Long, Long)]): Unit = {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, s"DROP TABLE IF EXISTS $table")
    Engine.execute(spark, s"""
      CREATE TABLE $table (k Int64, x Int64, s String)
      ENGINE=MergeTree() ORDER BY (k)""")
    batches.foreach { case (lo, hi) =>
      Engine.execute(spark, s"""
        INSERT INTO $table
        SELECT number AS k, number + $lo AS x,
               concat('v', toString(number + $lo)) AS s
        FROM numbers(${hi - lo})""")
    }
  }

  test("minmax index prunes files on a selective non-sort-key range predicate") {
    mk("graft_t.ski", Seq((0L, 100L), (10000L, 10100L), (20000L, 20100L)))
    Engine.execute(spark,
      "ALTER TABLE graft_t.ski ADD INDEX ix_x x TYPE minmax GRANULARITY 4")
    Engine.execute(spark, "ALTER TABLE graft_t.ski MATERIALIZE INDEX ix_x")
    val total = spark.table("graft_t.ski").inputFiles.length
    assert(total >= 3, s"expected >=3 files, got $total")

    val q = "SELECT count() AS n, sum(x) AS sx FROM graft_t.ski WHERE x >= 10050 AND x < 10060"
    val df = Engine.execute(spark, q)
    val scanned = scannedFiles(df)
    assert(scanned < total, s"index should prune: scanned $scanned of $total")
    assert(SkipIndexPrune.lastPruneFor("graft_t.ski").exists {
      case (kept, all) => kept < all
    })
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) == (10L, (10050L to 10059L).sum))

    // ground truth: the same query with pruning disabled
    SkipIndexPrune.enabled = false
    try {
      val r0 = Engine.execute(spark, q).collect().head
      assert((r.getLong(0), r.getLong(1)) == (r0.getLong(0), r0.getLong(1)))
    } finally SkipIndexPrune.enabled = true
  }

  test("set(n) index prunes on equality; an overflowed set never prunes") {
    mk("graft_t.skset", Seq((0L, 50L), (1000L, 1050L)))
    // x has 50 distinct values per file: set(100) holds them exactly
    Engine.execute(spark,
      "ALTER TABLE graft_t.skset ADD INDEX ix_s x TYPE set(100)")
    Engine.execute(spark, "ALTER TABLE graft_t.skset MATERIALIZE INDEX ix_s")
    val total = spark.table("graft_t.skset").inputFiles.length
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skset WHERE x = 1010")
    assert(scannedFiles(df) < total)
    assert(df.collect().head.getLong(0) == 1L)

    // set(3) overflows (50 distinct per file) -> no pruning, still correct
    Engine.execute(spark,
      "ALTER TABLE graft_t.skset ADD INDEX ix_o x TYPE set(3)")
    Engine.execute(spark, "ALTER TABLE graft_t.skset DROP INDEX ix_s")
    Engine.execute(spark, "ALTER TABLE graft_t.skset MATERIALIZE INDEX ix_o")
    val df2 = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skset WHERE x = 1010")
    assert(scannedFiles(df2) == total,
      "an overflowed set index must keep every file")
    assert(df2.collect().head.getLong(0) == 1L)
  }

  test("bloom_filter index prunes string equality and IN lists") {
    mk("graft_t.skbf", Seq((0L, 200L), (5000L, 5200L)))
    Engine.execute(spark,
      "ALTER TABLE graft_t.skbf ADD INDEX ix_b s TYPE bloom_filter GRANULARITY 2")
    Engine.execute(spark, "ALTER TABLE graft_t.skbf MATERIALIZE INDEX ix_b")
    val total = spark.table("graft_t.skbf").inputFiles.length
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skbf WHERE s = 'v5100'")
    assert(scannedFiles(df) < total)
    assert(df.collect().head.getLong(0) == 1L)
    val dfIn = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skbf WHERE s IN ('v5100', 'v5101')")
    assert(scannedFiles(dfIn) < total)
    assert(dfIn.collect().head.getLong(0) == 2L)
  }

  test("inserts after ADD INDEX are indexed incrementally; unindexed files always scan") {
    mk("graft_t.skinc", Seq((0L, 100L)))
    // ADD only — the pre-existing file is NOT indexed (ClickHouse
    // semantics: old parts need MATERIALIZE) and must always be kept
    Engine.execute(spark,
      "ALTER TABLE graft_t.skinc ADD INDEX ix_i x TYPE minmax")
    Engine.execute(spark, """
      INSERT INTO graft_t.skinc
      SELECT number AS k, number + 30000 AS x,
             concat('v', toString(number)) AS s FROM numbers(100)""")
    val total = spark.table("graft_t.skinc").inputFiles.length
    // predicate matching NOTHING: pruning may drop the new (indexed)
    // files but never the old (unindexed) ones
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skinc WHERE x = 999999")
    val scanned = scannedFiles(df)
    assert(scanned < total, "the new batch's files should be prunable")
    assert(scanned > 0, "pre-ADD files are unindexed and must remain")
    assert(df.collect().head.getLong(0) == 0L)
  }

  test("ngrambf_v1 prunes LIKE '%substr%' — and keeps every file that matches") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skng")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skng (k Int64, url String)
      ENGINE=MergeTree() ORDER BY (k)""")
    // batch 1: plain urls; batch 2: some contain the needle
    Engine.execute(spark, """
      INSERT INTO graft_t.skng
      SELECT number, concat('http://example.com/page/', toString(number))
      FROM numbers(200)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skng
      SELECT number + 1000,
             if(number % 7 = 0,
                concat('http://zebrafish.io/q=', toString(number)),
                concat('http://other.net/', toString(number)))
      FROM numbers(200)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.skng ADD INDEX ix_ng url
      TYPE ngrambf_v1(3, 8192, 2, 0) GRANULARITY 1""")
    Engine.execute(spark, "ALTER TABLE graft_t.skng MATERIALIZE INDEX ix_ng")
    val total = spark.table("graft_t.skng").inputFiles.length
    val q = "SELECT count() AS n FROM graft_t.skng WHERE url LIKE '%zebrafish%'"
    val df = Engine.execute(spark, q)
    assert(scannedFiles(df) < total,
      "ngram bloom should exclude the batch-1 files (no 'zebrafish' grams)")
    val expected = (0 until 200).count(_ % 7 == 0)
    assert(df.collect().head.getLong(0) == expected.toLong)
    // the same result with pruning off
    graft.plans.SkipIndexPrune.enabled = false
    try assert(Engine.execute(spark, q).collect().head.getLong(0) == expected.toLong)
    finally graft.plans.SkipIndexPrune.enabled = true
    // a needle shorter than n=3 gives no grams: no pruning, still right
    val short = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skng WHERE url LIKE '%zz%'")
    assert(scannedFiles(short) == total)
    assert(short.collect().head.getLong(0) == 0L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skng")
  }

  test("tokenbf_v1 prunes equality and interior-token LIKE; boundary fragments stay conservative") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.sktk")
    Engine.execute(spark, """
      CREATE TABLE graft_t.sktk (k Int64, tag String)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.sktk
      SELECT number, concat('alpha beta gamma ', toString(number))
      FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.sktk
      SELECT number + 500, concat('delta epsilon zeta ', toString(number))
      FROM numbers(100)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.sktk ADD INDEX ix_tk tag
      TYPE tokenbf_v1(4096, 3, 0)""")
    Engine.execute(spark, "ALTER TABLE graft_t.sktk MATERIALIZE INDEX ix_tk")
    val total = spark.table("graft_t.sktk").inputFiles.length
    // ' epsilon ' is an INTERIOR token of the pattern -> prunable
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.sktk WHERE tag LIKE '% epsilon %'")
    assert(scannedFiles(df) < total)
    assert(df.collect().head.getLong(0) == 100L)
    // 'lpha bet' has interior token none ('lpha'/'bet' touch the ends)
    // -> conservative: no pruning, because 'lpha' could be the tail of
    // 'alpha' without 'lpha' ever being a whole token
    val frag = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.sktk WHERE tag LIKE '%lpha bet%'")
    assert(scannedFiles(frag) == total,
      "boundary fragments are not guaranteed tokens — must not prune")
    assert(frag.collect().head.getLong(0) == 100L)
    // type guard: tokenbf on a numeric column refuses
    intercept[Exception](Engine.execute(spark,
      "ALTER TABLE graft_t.sktk ADD INDEX bad k TYPE tokenbf_v1(4096, 3, 0)"))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.sktk")
  }

  test("hasToken prunes through tokenbf_v1 directly (whole token, no interior rule)") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skht")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skht (k Int64, tag String)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skht
      SELECT number, concat('alpha beta ', toString(number)) FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skht
      SELECT number + 500, concat('gamma delta ', toString(number)) FROM numbers(100)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.skht ADD INDEX ix tag TYPE tokenbf_v1(4096, 3, 0)""")
    Engine.execute(spark, "ALTER TABLE graft_t.skht MATERIALIZE INDEX ix")
    val total = spark.table("graft_t.skht").inputFiles.length
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skht WHERE hasToken(tag, 'gamma')")
    assert(scannedFiles(df) < total, "hasToken should prune via the token bloom")
    assert(df.collect().head.getLong(0) == 100L)
    // 'gam' is not a whole token anywhere: correct zero, and since a
    // partial word can't be tested against the token bloom, no pruning
    val part = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skht WHERE hasToken(tag, 'gam')")
    assert(part.collect().head.getLong(0) == 0L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skht")
  }

  test("lower(col) expression index prunes case-insensitive LIKE; plain predicates don't consult it") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.sklo")
    Engine.execute(spark, """
      CREATE TABLE graft_t.sklo (k Int64, s String)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.sklo
      SELECT number, concat('Common Text ', toString(number)) FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.sklo
      SELECT number + 500, concat('ZebraFish Entry ', toString(number))
      FROM numbers(100)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.sklo ADD INDEX ix_lo lower(s)
      TYPE ngrambf_v1(4, 8192, 2, 0)""")
    Engine.execute(spark, "ALTER TABLE graft_t.sklo MATERIALIZE INDEX ix_lo")
    val total = spark.table("graft_t.sklo").inputFiles.length
    // the canonical case-insensitive search: lower(s) LIKE '%needle%'
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.sklo WHERE lower(s) LIKE '%zebrafish%'")
    assert(scannedFiles(df) < total,
      "lower() index should prune the lower()-wrapped predicate")
    assert(df.collect().head.getLong(0) == 100L)
    // a predicate over the RAW column must NOT consult the lower()
    // stats (the raw value 'ZebraFish' has different grams than the
    // indexed 'zebrafish' — consulting them would wrongly prune)
    val raw = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.sklo WHERE s LIKE '%ZebraFish%'")
    assert(scannedFiles(raw) == total,
      "raw-column predicate must not use the lower() index")
    assert(raw.collect().head.getLong(0) == 100L)
    // and the listing face shows the expression
    val listed = Engine.execute(spark, """
      SELECT expr FROM system.data_skipping_indices WHERE table = 'sklo'""")
      .collect().map(_.getString(0)).toSeq
    assert(listed == Seq("lower(s)"))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.sklo")
  }

  test("multiSearchAny prunes when NO needle's grams can match; any-possible keeps") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skms")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skms (k Int64, s String)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skms
      SELECT number, concat('common text ', toString(number)) FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skms
      SELECT number + 500, concat('zebrafish entry ', toString(number))
      FROM numbers(100)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.skms ADD INDEX ix s TYPE ngrambf_v1(4, 8192, 2, 0)""")
    Engine.execute(spark, "ALTER TABLE graft_t.skms MATERIALIZE INDEX ix")
    val total = spark.table("graft_t.skms").inputFiles.length
    // both needles absent from batch 1 -> its files prune
    val df = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skms
      WHERE multiSearchAny(s, ['zebrafish', 'quagga'])""")
    assert(scannedFiles(df) < total)
    assert(df.collect().head.getLong(0) == 100L)
    // a needle shorter than n yields no grams -> that needle is always
    // "possible" -> the disjunction never prunes; result still right
    val keep = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skms
      WHERE multiSearchAny(s, ['quagga', 'xt '])""")
    assert(scannedFiles(keep) == total)
    assert(keep.collect().head.getLong(0) == 100L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skms")
  }

  test("OR predicates prune: a file is dropped only when BOTH branches are impossible") {
    mk("graft_t.skor", Seq((0L, 100L), (10000L, 10100L), (20000L, 20100L)))
    Engine.execute(spark,
      "ALTER TABLE graft_t.skor ADD INDEX ix_x x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skor MATERIALIZE INDEX ix_x")
    val total = spark.table("graft_t.skor").inputFiles.length
    // both branches land in real batches: batch 1 and batch 3 survive,
    // batch 2's files are impossible under EITHER branch -> pruned
    val df = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skor
      WHERE x = 50 OR x = 20050""")
    val scanned = scannedFiles(df)
    assert(scanned < total, s"OR should prune batch 2: $scanned of $total")
    assert(df.collect().head.getLong(0) == 2L)
    // an OR with one un-indexable branch must not prune anything
    val safe = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skor
      WHERE x = 50 OR length(s) > 0""")
    assert(scannedFiles(safe) == total)
    assert(safe.collect().head.getLong(0) == 300L)
    // AND nested under OR: (impossible AND anything) OR impossible -> prune
    val nested = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skor
      WHERE (x = 50 AND k >= 0) OR x = 10050""")
    assert(scannedFiles(nested) < total)
    assert(nested.collect().head.getLong(0) == 2L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skor")
  }

  test("skip indexes survive a restart with the durable catalog") {
    mk("graft_t.skdur", Seq((0L, 100L), (40000L, 40100L)))
    Engine.execute(spark,
      "ALTER TABLE graft_t.skdur ADD INDEX ix_d x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skdur MATERIALIZE INDEX ix_d")
    CatalogStore.simulateRestart(spark, Seq("graft_t.skdur"))
    val total = {
      Engine.execute(spark, "SELECT count() FROM graft_t.skdur") // force restore
      spark.table("graft_t.skdur").inputFiles.length
    }
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skdur WHERE x = 40050")
    assert(scannedFiles(df) < total,
      "restored manifest should still prune")
    assert(df.collect().head.getLong(0) == 1L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skdur")
  }

  test("skip indexes compose with partition pruning on a partitioned MergeTree") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skpt")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skpt (k Int64, x Int64, d Date)
      ENGINE=MergeTree() PARTITION BY toYYYYMM(d) ORDER BY (k)""")
    // two months x two batches with disjoint x ranges per batch
    for ((off, month) <- Seq((0L, "2024-01-15"), (100000L, "2024-01-16"),
                             (200000L, "2024-02-15"), (300000L, "2024-02-16")))
      Engine.execute(spark, s"""
        INSERT INTO graft_t.skpt
        SELECT number, number + $off, toDate('$month') FROM numbers(200)""")
    Engine.execute(spark, "ALTER TABLE graft_t.skpt ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skpt MATERIALIZE INDEX ix")
    val total = spark.table("graft_t.skpt").inputFiles.length
    val df = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skpt
      WHERE d >= '2024-02-01' AND x >= 300050 AND x < 300060""")
    // both prunings in one plan: the scan lists only February files
    // (PartitionPruneFromDate derived the _part bound) AND only the
    // batch-4 files among them (the minmax manifest)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_part".r.findFirstIn(plan).isDefined,
      "partition pruning should fire alongside the skip index")
    assert(scannedFiles(df) < total / 2,
      s"skip index should prune within the surviving month")
    assert(df.collect().head.getLong(0) == 10L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skpt")
  }

  test("mutations re-stat skip indexes: pruning stays active, survives restart, never wrong") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skmu")
    // UNPARTITIONED on purpose: the mutation's TRUNCATE deletes the
    // whole table root, including the persisted manifest — the
    // re-stat + re-persist path is what this test gates
    Engine.execute(spark, """
      CREATE TABLE graft_t.skmu (k Int64, x Int64)
      ENGINE=MergeTree() ORDER BY (k)""")
    for (off <- Seq(0L, 100000L, 200000L))
      Engine.execute(spark, s"""
        INSERT INTO graft_t.skmu
        SELECT number + $off AS k, number + $off AS x FROM numbers(1000)""")
    Engine.execute(spark, "ALTER TABLE graft_t.skmu ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skmu MATERIALIZE INDEX ix")
    Engine.execute(spark, "ALTER TABLE graft_t.skmu DELETE WHERE x % 2 = 1")
    val total = spark.table("graft_t.skmu").inputFiles.length
    val q = "SELECT count() AS n FROM graft_t.skmu WHERE x >= 100000 AND x < 100100"
    assert(Engine.execute(spark, q).collect().head.getLong(0) == 50L,
      "post-mutation result must be exact (no wrong prune of rewritten files)")
    // the rewrite may compact to few files — prove the re-stat with a
    // no-match probe, which must prune EVERY re-statted file
    val qMiss = "SELECT count() AS n FROM graft_t.skmu WHERE x = 999999999"
    val miss = Engine.execute(spark, qMiss)
    assert(miss.collect().head.getLong(0) == 0L)
    assert(scannedFiles(miss) < total,
      "mutation must re-stat the rewritten files — pruning should still fire")
    // the manifest was re-persisted after the TRUNCATE destroyed it
    CatalogStore.simulateRestart(spark, Seq("graft_t.skmu"))
    Engine.execute(spark, "SELECT count() FROM graft_t.skmu")
    assert(Engine.execute(spark, q).collect().head.getLong(0) == 50L)
    val miss2 = Engine.execute(spark, qMiss)
    assert(miss2.collect().head.getLong(0) == 0L)
    assert(scannedFiles(miss2) < total,
      "restored post-mutation manifest should still prune")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skmu")
  }

  test("TRUNCATE keeps index definitions (stats die with the data) across restarts") {
    mk("graft_t.sktr", Seq((0L, 100L)))
    Engine.execute(spark, "ALTER TABLE graft_t.sktr ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.sktr MATERIALIZE INDEX ix")
    Engine.execute(spark, "TRUNCATE TABLE graft_t.sktr")
    val listed = Engine.execute(spark, """
      SELECT name, indexed_files FROM system.data_skipping_indices
      WHERE table = 'sktr'""").collect()
    assert(listed.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ix", 0L)), "definition survives TRUNCATE, stats do not")
    CatalogStore.simulateRestart(spark, Seq("graft_t.sktr"))
    Engine.execute(spark, "SELECT count() FROM graft_t.sktr")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.data_skipping_indices
      WHERE table = 'sktr'""").collect().head.getLong(0) == 1L,
      "TRUNCATE re-persisted the (stat-less) manifest the delete destroyed")
    // new inserts stat incrementally into the surviving definition
    Engine.execute(spark, """
      INSERT INTO graft_t.sktr
      SELECT number, number + 50000, concat('v', toString(number))
      FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.sktr
      SELECT number, number + 90000, concat('w', toString(number))
      FROM numbers(100)""")
    val total = spark.table("graft_t.sktr").inputFiles.length
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.sktr WHERE x >= 90000 AND x < 90010")
    assert(df.collect().head.getLong(0) == 10L)
    assert(scannedFiles(df) < total)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.sktr")
  }

  test("FREEZE snapshots survive mutations and TRUNCATE on an UNPARTITIONED table") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skfz")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skfz (k Int64, x Int64)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark,
      "INSERT INTO graft_t.skfz SELECT number, number FROM numbers(100)")
    Engine.execute(spark, "ALTER TABLE graft_t.skfz FREEZE WITH NAME 'bk'")
    def backupRows(): Long = Engine.execute(spark, """
      SELECT count() AS n FROM system.frozen_parts
      WHERE table = 'skfz' AND backup_name = 'bk'""").collect().head.getLong(0)
    assert(backupRows() == 1L)
    // a mutation TRUNCATEs the unpartitioned table root — the snapshot
    // must be staged out and restored, not destroyed
    Engine.execute(spark, "ALTER TABLE graft_t.skfz DELETE WHERE x >= 50")
    assert(backupRows() == 1L, "mutation must not destroy FREEZE backups")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_t.skfz")
      .collect().head.getLong(0) == 50L)
    // OPTIMIZE (compaction rewrite) and user-level TRUNCATE too
    Engine.execute(spark, "OPTIMIZE TABLE graft_t.skfz")
    assert(backupRows() == 1L, "OPTIMIZE must not destroy FREEZE backups")
    Engine.execute(spark, "TRUNCATE TABLE graft_t.skfz")
    assert(backupRows() == 1L, "TRUNCATE must not destroy FREEZE backups")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skfz")
  }

  test("restored minmax stats keep Float type and microsecond timestamps — no wrong prunes") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skfd")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skfd (k Int64, f Float32, ts DateTime64(6))
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skfd VALUES
      (1, 0.1, '2024-01-01 10:00:00.000500')""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skfd VALUES
      (2, 99.5, '2024-06-01 00:00:00.000000')""")
    Engine.execute(spark, "ALTER TABLE graft_t.skfd ADD INDEX ixf f TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skfd ADD INDEX ixt ts TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skfd MATERIALIZE INDEX ixf")
    Engine.execute(spark, "ALTER TABLE graft_t.skfd MATERIALIZE INDEX ixt")
    val total = spark.table("graft_t.skfd").inputFiles.length
    // sanity: the index is actually consulted for Float probes
    val miss = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skfd WHERE f = 55.5")
    assert(scannedFiles(miss) < total,
      "Float minmax index should prune a no-match probe (pre-restart)")
    CatalogStore.simulateRestart(spark, Seq("graft_t.skfd"))
    Engine.execute(spark, "SELECT count() FROM graft_t.skfd")
    // Float fidelity: a FLOAT-typed probe (toFloat32 folds to a Float
    // literal; a bare 0.1 would widen the comparison to Double and
    // match nothing regardless of the index). Pre-fix the restored
    // stat was the Double 0.10000000149… whose text never equals
    // "0.1" — the exact-match row was wrongly pruned.
    val fEq = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skfd WHERE f = toFloat32(0.1)")
    assert(fEq.collect().head.getLong(0) == 1L,
      "restored Float stats must not wrongly prune an exact match")
    // Timestamp fidelity: file max is 10:00:00.000500; a ms-truncated
    // restore (10:00:00.000) would wrongly prune ts > 10:00:00.000
    val tGt = Engine.execute(spark, """
      SELECT count() AS n FROM graft_t.skfd
      WHERE ts > '2024-01-01 10:00:00.000' AND ts < '2024-02-01'""")
    assert(tGt.collect().head.getLong(0) == 1L,
      "restored timestamp stats must keep microsecond precision")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skfd")
  }

  test("bloom probe hashes in the column's type space (wide Decimal equality)") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skdc")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skdc (k Int64, d Decimal(20, 2))
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skdc
      SELECT number, CAST(number AS DECIMAL(20, 2)) + 0.25 FROM numbers(100)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.skdc
      SELECT number + 500,
             CAST(number + 70000 AS DECIMAL(20, 2)) + 0.25 FROM numbers(100)""")
    Engine.execute(spark,
      "ALTER TABLE graft_t.skdc ADD INDEX ixd d TYPE bloom_filter")
    Engine.execute(spark, "ALTER TABLE graft_t.skdc MATERIALIZE INDEX ixd")
    // precision 20 > 18: the build hashed the byte representation; a
    // probe literal re-inferred at small precision would hash the
    // unscaled long instead — never matching, wrongly pruning EVERY file
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skdc WHERE d = 70005.25")
    assert(df.collect().head.getLong(0) == 1L,
      "wide-decimal equality must not be wrongly pruned")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skdc")
  }

  test("EXCHANGE TABLES drops indexes durably — no resurrection after restart") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.exa")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.exb")
    for (t <- Seq("exa", "exb")) {
      Engine.execute(spark, s"""
        CREATE TABLE graft_t.$t (k Int64, x Int64)
        ENGINE=MergeTree() ORDER BY (k)""")
      Engine.execute(spark,
        s"INSERT INTO graft_t.$t SELECT number, number FROM numbers(50)")
    }
    Engine.execute(spark, "ALTER TABLE graft_t.exa ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.exa MATERIALIZE INDEX ix")
    Engine.execute(spark, "EXCHANGE TABLES graft_t.exa AND graft_t.exb")
    CatalogStore.simulateRestart(spark, Seq("graft_t.exa", "graft_t.exb"))
    Engine.execute(spark, "SELECT count() FROM graft_t.exa")
    Engine.execute(spark, "SELECT count() FROM graft_t.exb")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.data_skipping_indices
      WHERE table IN ('exa', 'exb')""").collect().head.getLong(0) == 0L,
      "swapped directories' persisted manifests must die with the in-memory defs")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.exa")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.exb")
  }

  test("column reshapes: indexes follow RENAME COLUMN, die with DROP COLUMN") {
    mk("graft_t.skrs", Seq((0L, 100L), (50000L, 50100L)))
    Engine.execute(spark, "ALTER TABLE graft_t.skrs ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_t.skrs MATERIALIZE INDEX ix")
    Engine.execute(spark, "ALTER TABLE graft_t.skrs RENAME COLUMN x TO y")
    val listed = Engine.execute(spark, """
      SELECT expr FROM system.data_skipping_indices WHERE table = 'skrs'""")
      .collect().map(_.getString(0)).toSeq
    assert(listed == Seq("y"), "index expression must follow the renamed column")
    val total = spark.table("graft_t.skrs").inputFiles.length
    val df = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skrs WHERE y >= 50000 AND y < 50010")
    assert(df.collect().head.getLong(0) == 10L)
    // the reshape may compact to few files — a no-match probe must
    // prune every re-statted file under the NEW column name
    val miss = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.skrs WHERE y = 999999999")
    assert(miss.collect().head.getLong(0) == 0L)
    assert(scannedFiles(miss) < total,
      "renamed-column index re-stats against the rewritten files")
    Engine.execute(spark, "ALTER TABLE graft_t.skrs DROP COLUMN y")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.data_skipping_indices
      WHERE table = 'skrs'""").collect().head.getLong(0) == 0L,
      "dropping the indexed column drops the index")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skrs")
  }

  test("inline INDEX definitions in CREATE TABLE register and system table lists them") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skil")
    Engine.execute(spark, """
      CREATE TABLE graft_t.skil (
        k Int64, x Int64,
        INDEX ix_x x TYPE minmax GRANULARITY 8)
      ENGINE=MergeTree() ORDER BY (k)""")
    val rows = Engine.execute(spark, """
      SELECT name, expr, type FROM system.data_skipping_indices
      WHERE table = 'skil'""").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("ix_x", "x", "minmax")))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.skil")
  }
}
