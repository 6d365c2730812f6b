package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times the headline queries (Q.bench = true) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
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
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val names = SparkEntry.benchNames
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // full warm-up pass: JVM/codegen/file-listing costs are one-time
    // session costs, not per-query engine throughput — measure the
    // steady state (standard bench discipline; cold-start is reported
    // by the driver's wall clock anyway)
    names.foreach { n =>
      try byName(n).run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // best-of-3: ambient machine load skews single shots 2-3x; the
    // minimum is the engine's actual throughput. A run that throws is a
    // FAILURE, not a fast run — reported as -1, never summed.
    val results = names.map { name =>
      val times = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          byName(name).run(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
        }
      }
      name -> times.minOption
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
    val total = results.flatMap(_._2).sum
    // ambient machine load at start and end of the run: co-scheduled
    // work skews wall-clock 2-3x, and without this the numbers can't be
    // read honestly (r4/r5 driver runs were re-diagnosed by hand)
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","loadavg":$loadEnd%.2f,"loadavg_start":$loadStart%.2f,"queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
