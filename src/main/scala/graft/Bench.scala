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
    // read as fake super-linear scaling in the 30M->100M decade. Target
    // ~8 waves x cores; clamp to [2m, 128m].
    val hitsBytes = {
      val loc = new java.net.URI(spark.table("hits").inputFiles.headOption
        .getOrElse("file:///tmp/graft-warehouse")).getPath
      def size(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
        else f.length
      size(new java.io.File(loc).getParentFile.getParentFile)
    }
    val splitBytes = math.min(128L << 20,
      math.max(2L << 20, hitsBytes / (cpus.toInt * 8)))
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
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    // every sample, in pass order — with loadavg_passes this lets a
    // reader separate an ambient spike (one bad sample, two clean) from
    // a real shift (all three moved) without rerunning the bench
    val samplesJson = names.map { k =>
      "\"" + k + "\":" + samples(k).reverse.map(v => f"$v%.3f")
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
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
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","headline_total":$headlineTotal%.3f,"cb_total":$cbTotal%.3f,"cb_queries":${cbNames.length},"hits_n":$hitsN,"fixture_build_sec":$fixtureSec%.1f,"partition_prune_ok":$pruneOk,"loadavg":$loadEnd%.2f,"loadavg_start":$loadStart%.2f,"loadavg_passes":$passLoadsJson,"queries":$qs,"samples":$samplesJson,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
