package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times the headline queries (Q.bench = true) on
  * SPARK_GRAFT_SF_DIR plus the REAL ClickBench 43-query sweep
  * (cb00–cb42) on a ~10× scaled `hits` fixture, and prints one JSON
  * line for the driver (the analog of the reference CI's per-query
  * result.csv, /root/reference/.github/workflows/test.yml:61-67).
  *
  * Results are fully materialized via a `noop`-format write (every
  * column computed, nothing collected to the driver) — a bare `count()`
  * would let Catalyst prune the whole projection and flatter the engine.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Ambient-load guard: a machine-wide spike at bench start corrupts
    // the committed artifact into reading as a code regression (the r14
    // driver window: pass-1 samples 4-8x best under loadavg 18+ vs the
    // same code at 0.98x under comparable load). If the 1-min loadavg
    // already exceeds half the cores BEFORE any work starts, sleep and
    // re-check a few times so the artifact reflects the code, not the
    // neighbor. Bounded (max ~3 min) and visible: guard_waits lands in
    // the JSON line.
    val guardThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_GUARD",
      (cpus.toInt / 2).toString).toDouble
    var guardWaits = 0
    def loadNow = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    while (guardWaits < 3 && guardThreshold > 0 && loadNow > guardThreshold) {
      System.err.println(
        f"BENCH GUARD: loadavg $loadNow%.1f > $guardThreshold%.1f, waiting 60s")
      Thread.sleep(60000)
      guardWaits += 1
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Reducer-count scaling, MEASURED not guessed: the r11 hypothesis
      // was that 32 reducers under-split the big aggregates at 150M+
      // (cb32: 17s at 150M -> 60s at 300M). A controlled A/B at 150M
      // (same fixture, back-to-back sweeps) says otherwise — AQE
      // initialPartitionNum=256 was a median 1.08x SLOWER across the 43
      // cb queries (cb18 1.48x) and faster on exactly one (cb23 0.87x):
      // in single-JVM local[32] all threads share one unified memory
      // region, the 32-partition aggregates never spill, and extra
      // reducers are pure task-scheduling + final-merge overhead. So
      // the default stays matched to cores; the env knob remains
      // because on a REAL multi-executor cluster (bounded per-executor
      // memory) the wide-initial-then-coalesce setting is the right
      // one — it just cannot be demonstrated in one JVM.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus))
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // default 100 disables the vectorized parquet reader + whole-stage
      // codegen for any scan wider than 100 fields — hits is 134 columns,
      // so SELECT * shapes (cb23) ran row-based. 200 covers it with slack;
      // codegen of a 134-field projection is still well within JIT limits.
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val headline = SparkEntry.benchNames
    // the full ClickBench sweep, timed at the bench-scale fixture
    val cbNames = SparkEntry.all.map(_.name).filter(_.startsWith("cb")).sorted
    val hitsN = sys.env.get("SPARK_GRAFT_HITS_N").map(_.toInt)
      .getOrElse(graft.dialect.HitsFixture.BenchN)
    val fixT0 = System.nanoTime()
    graft.dialect.HitsFixture.ensureScaled(spark, hitsN)
    val fixtureSec = (System.nanoTime() - fixT0) / 1e9
    // Size scan splits from the data, never a constant: the 2m default
    // tuned for the 3M-row fixture generated ~3,300 near-empty splits
    // against the 100M fixture's 200MB files (2 row groups each) — a
    // flat ~6s of pure task-scheduling overhead on EVERY query, which
    // read as fake super-linear scaling in the 30M->100M decade.
    // r15 re-measure (DevAb floorSweep, 12-query subset, interleaved
    // best-of-3): the old ~8-waves target with a 2m clamp floor left
    // ~102 near-empty tasks per query at the 3M driver scale — 6m
    // splits ran the subset 13% faster (5.07s vs 5.85s best, medians
    // agree), 16m was no faster and straggler-prone. Target ~4 waves
    // x cores, clamp to [6m, 128m] (guide §6: fewer, larger splits;
    // still data- and core-derived, so the 30M/100M decades and the
    // driver's low-core rerun keep their proportional split sizes).
    val hitsBytes = {
      val loc = new java.net.URI(spark.table("hits").inputFiles.headOption
        .getOrElse("file:///tmp/graft-warehouse")).getPath
      def size(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
        else f.length
      size(new java.io.File(loc).getParentFile.getParentFile)
    }
    val splitBytes = math.min(128L << 20,
      math.max(6L << 20, hitsBytes / (cpus.toInt * 4)))
    // cb queries scan the hits fixture — size their splits to it; the
    // headline queries scan the (small) SF tables, where 2m keeps all
    // cores busy
    def setSplit(name: String): Unit =
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (if (name.startsWith("cb")) splitBytes else 2L << 20).toString)
    val names = headline ++ cbNames
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // full warm-up pass: JVM/codegen/file-listing costs are one-time
    // session costs, not per-query engine throughput — measure the
    // steady state (standard bench discipline; cold-start is reported
    // by the driver's wall clock anyway)
    names.foreach { n =>
      setSplit(n)
      try byName(n).run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // best-of-3, with the three repeats INTERLEAVED as full sweep
    // passes rather than back-to-back: a transient ambient-load spike
    // (co-scheduled driver work, page-cache churn) lasting under one
    // pass (~15s at 3M rows) then corrupts at most one of a query's
    // three samples instead of all three — the r10 driver artifact had
    // cb01 at 9.35s vs 0.19s local precisely because its repeats all
    // landed inside one spike window. Same total work as before. A run
    // that throws is a FAILURE, not a fast run — reported as -1, never
    // summed.
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    val crashed = scala.collection.mutable.Set.empty[String]
    val passLoads = (1 to 3).map { _ =>
      names.foreach { name =>
        setSplit(name)
        val t0 = System.nanoTime()
        try {
          byName(name).run(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          samples(name) ::= (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            crashed += name
        }
      }
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    }
    val results = names.map { name =>
      name -> (if (crashed(name)) None else samples(name).minOption)
    }
    // partition-prune evidence on the benched plans: the July
    // range-filter queries must scan only the 201307 partition
    // (PartitionPruneFromDate derives the _part bounds; at 100 TB this
    // is one month read instead of all of them)
    val pruneOk = Seq("cb36_pageviews_url", "cb40_urlhash_date",
      "cb42_minute_series").forall { n =>
      val plan = byName(n).run(spark, sfDir).queryExecution.executedPlan.toString
      "PartitionFilters: \\[[^\\]]*_part[^\\]]*201307".r.findFirstIn(plan).isDefined
    }
    // skip-index A/B on banded re-layouts of the LIKE-scan queries
    // (cb20/21/22 shapes): data-locality is the precondition any
    // engine's skip index needs, so the indexed variants run over slim
    // MergeTree twins ORDER-BY-clustered on the probed column, with
    // the SAME query timed prune-on vs prune-off (isolates the index
    // from the layout). Tables + manifests persist across JVMs via the
    // durable catalog — the build is a one-time cost per fixture size.
    val ixT0 = System.nanoTime()
    val ixBuildOk =
      try { ensureBanded(spark, hitsN); true }
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH banded-fixture build failed: ${e.getMessage}")
          false
      }
    // build cost timed around ensureBanded ALONE — subtracting only the
    // best-of samples under-counted the A/B's own runtime into it
    val ixBuildSec = (System.nanoTime() - ixT0) / 1e9
    val skipAb =
      if (!ixBuildOk) Nil
      else try abBlock(spark) catch {
        case e: Throwable =>
          System.err.println(s"BENCH skip-A/B failed: ${e.getMessage}")
          Nil
      }
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
    val total = results.flatMap(_._2).sum
    val headlineTotal = results.filter(r => headline.contains(r._1)).flatMap(_._2).sum
    val cbTotal = results.filter(r => cbNames.contains(r._1)).flatMap(_._2).sum
    // ambient machine load at start and end of the run: co-scheduled
    // work skews wall-clock 2-3x, and without this the numbers can't be
    // read honestly (r4/r5 driver runs were re-diagnosed by hand)
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val passLoadsJson = passLoads.map(l => f"$l%.2f").mkString("[", ",", "]")
    // Every per-pass sample (full names) goes to a sidecar FILE, never
    // stdout: the driver keeps only the final ~2 KB of output and
    // parses the one JSON line it finds there — the r12 run's 3-sample
    // arrays pushed the totals out of that window and the round's
    // numbers were unrecoverable from the artifact. The printed line
    // stays compact: totals + per-query BEST under SHORT keys.
    val samplesJson = names.map { k =>
      "\"" + k + "\":" + samples(k).reverse.map(v => f"$v%.3f")
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val bestFullJson = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val abJson = skipAb.map { case (n, on, off, rows, kept, tot, kb, tb) =>
      f""""$n":{"pruned_sec":$on%.3f,"full_sec":$off%.3f,"speedup":${off / on}%.2f,"rows":$rows,"files_kept":$kept,"files_total":$tot,"bytes_kept":$kb,"bytes_total":$tb}"""
    }.mkString("{", ",", "}")
    val samplesFile = new java.io.File("BENCH_samples_latest.json").getAbsoluteFile
    try java.nio.file.Files.write(samplesFile.toPath,
      (f"""{"metric":"bench_samples","hits_n":$hitsN,"sf":"$sfDir","loadavg_passes":$passLoadsJson,"best":$bestFullJson,"samples":$samplesJson,"skip_ab":$abJson}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"BENCH samples file write failed: $e") }
    // short keys: the SURVEY-id prefix before the first underscore
    // (cb00..cb42, b1..b8, g13, st1) — unique today, guarded anyway
    val shortNames = names.map(n => n -> n.split('_').head)
    val short: Map[String, String] =
      if (shortNames.map(_._2).distinct.length == shortNames.length)
        shortNames.toMap
      else shortNames.map(p => p._1 -> p._1).toMap
    val qs = results.map {
      case (k, Some(v)) => "\"" + short(k) + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + short(k) + "\":-1"
    }.mkString("{", ",", "}")
    val abShort = skipAb.map { case (n, on, off, _, kept, tot, kb, tb) =>
      f""""$n":[$on%.3f,$off%.3f,$kept,$tot,$kb,$tb]"""
    }.mkString("{", ",", "}")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","headline_total":$headlineTotal%.3f,"cb_total":$cbTotal%.3f,"cb_queries":${cbNames.length},"hits_n":$hitsN,"fixture_build_sec":$fixtureSec%.1f,"ix_build_sec":$ixBuildSec%.1f,"partition_prune_ok":$pruneOk,"skip_ab":$abShort,"loadavg":$loadEnd%.2f,"loadavg_start":$loadStart%.2f,"guard_waits":$guardWaits,"loadavg_passes":$passLoadsJson,"queries":$qs,"failed":${failed.mkString("[", ",", "]")},"samples_file":"${samplesFile.getName}","sf":"$sfDir"}"""
    // hard guard on the tail-capture contract: if the compact line ever
    // outgrows the driver's window, drop the per-query map (it stays
    // available in the sidecar) rather than lose the totals again
    println(
      if (line.length <= 1850) line
      else line.replace(s""""queries":$qs,""", ""))
    spark.stop()
  }

  /** Slim MergeTree twins of `hits`, ORDER-BY-clustered on the probed
    * string column with an ngrambf_v1 skip index — the banded layout
    * the indexed ClickBench variants run over. Idempotent per size. */
  private def ensureBanded(spark: SparkSession, n: Int): Unit = {
    import graft.dialect.Engine
    Seq(
      ("clickbench.hits_urlband", "URL",
        "URL String, SearchPhrase String",
        "SELECT URL, SearchPhrase FROM hits"),
      ("clickbench.hits_titleband", "Title",
        "Title String, URL String, SearchPhrase String, UserID UInt64",
        "SELECT Title, URL, SearchPhrase, UserID FROM hits")
    ).foreach { case (tbl, orderCol, cols, sel) =>
      val loaded =
        try spark.catalog.tableExists(tbl) && spark.table(tbl).count() == n
        catch { case _: Throwable => false }
      if (!loaded) {
        Engine.execute(spark, s"DROP TABLE IF EXISTS $tbl SYNC")
        Engine.execute(spark,
          s"CREATE TABLE $tbl ($cols) ENGINE=MergeTree() ORDER BY ($orderCol)")
        Engine.execute(spark, s"INSERT INTO $tbl $sel")
        Engine.execute(spark, s"ALTER TABLE $tbl ADD INDEX ix_g $orderCol " +
          "TYPE ngrambf_v1(4, 65536, 2, 0)")
        Engine.execute(spark, s"ALTER TABLE $tbl MATERIALIZE INDEX ix_g")
      }
    }
  }

  /** The cb20/21/22 LIKE shapes on the banded tables, best-of-3 with
    * the prune rule ON vs OFF; row counts must agree (a wrong prune is
    * a bench failure, not a fast run). Also records the PLAN-level
    * pruning decision (files kept / total) — at the 3M driver scale
    * the wall-clock is fixed-cost-bound (the whole scan is ~100 ms),
    * so kept/total is the honest signal; the 30M/100M skipscale
    * artifacts carry the wall-clock story.
    * Returns (name, onSec, offSec, rows, keptFiles, totalFiles,
    * keptBytes, totalBytes) — the byte pair is the IO-reduction signal
    * for probes whose wall-clock sits under the fixed-cost floor at
    * the 3M driver scale. */
  private def abBlock(spark: SparkSession)
      : Seq[(String, Double, Double, Long, Int, Int, Long, Long)] = {
    import graft.dialect.Engine
    val qs = Seq(
      ("cb20x", "clickbench.hits_urlband",
        "SELECT COUNT(*) AS c FROM clickbench.hits_urlband WHERE URL LIKE '%google%'"),
      ("cb21x", "clickbench.hits_urlband", """
        SELECT SearchPhrase, MIN(URL) AS u, COUNT(*) AS c
        FROM clickbench.hits_urlband
        WHERE URL LIKE '%google%' AND SearchPhrase <> ''
        GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"""),
      ("cb22x", "clickbench.hits_titleband", """
        SELECT SearchPhrase, MIN(URL) AS u, MIN(Title) AS t, COUNT(*) AS c,
               COUNT(DISTINCT UserID) AS uu
        FROM clickbench.hits_titleband
        WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%'
          AND SearchPhrase <> ''
        GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"""),
      // SCAN-dominated probe (the cb20x-22x trio is agg-dominated and
      // reads ~1x wall-clock at 3M by design): the cost here IS
      // decompressing + LIKE-scanning every URL and materializing both
      // columns — a rare needle (1 in 4600 rows, URL-clustered) that
      // the ngrambf index confines to few files, so the wall-clock win
      // shows on hits itself, not only on the skipscale probe table
      ("cb23x", "clickbench.hits_urlband", """
        SELECT URL, SearchPhrase FROM clickbench.hits_urlband
        WHERE URL LIKE '%/p/4399%'"""))
    qs.map { case (name, tbl, q) =>
      def best3(): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Engine.execute(spark, q).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      // the equality guard compares the RESULT VALUES, not row counts —
      // a COUNT(*) query returns one row no matter what it counted, and
      // the LIMIT 10 shapes return ten rows even with divergent content
      def signature(): (Long, Int) = {
        val rows = Engine.execute(spark, q).collect()
        (rows.length.toLong,
          rows.map(_.toString).sorted.mkString("|").hashCode)
      }
      graft.plans.SkipIndexPrune.enabled = true
      val sigOn = signature()
      val on = best3()
      val kept = graft.plans.SkipIndexPrune.lastPruneFor(tbl)
      val keptB = graft.plans.SkipIndexPrune.lastPruneBytesFor(tbl)
      graft.plans.SkipIndexPrune.enabled = false
      val sigOff = signature()
      val off = best3()
      graft.plans.SkipIndexPrune.enabled = true
      require(sigOn == sigOff,
        s"$name: pruning changed the answer ($sigOn vs $sigOff)")
      (name, on, off, sigOn._1,
        kept.map(_._1).getOrElse(-1), kept.map(_._2).getOrElse(-1),
        keptB.map(_._1).getOrElse(-1L), keptB.map(_._2).getOrElse(-1L))
    }
  }
}
