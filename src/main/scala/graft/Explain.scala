package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run/explain registered queries.
  *
  * usage: runMain graft.Explain <sfDir> [queryName ...]
  *   - no names: list queries and smoke-run each (row count)
  *   - names:    print formatted physical plan + first rows
  */
object Explain {
  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // see the Bench.scala note: measured A/B says wide-initial hurts
      // in single-JVM local mode; knob kept for cluster deployments
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus))
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSeq
    val spark = session()
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val targets = if (names.nonEmpty) names else SparkEntry.all.map(_.name)
    targets.foreach { n =>
      byName.get(n) match {
        case None => println(s"[explain] unknown query: $n")
        case Some(q) =>
          try {
            val df = q.run(spark, sfDir)
            if (names.nonEmpty) {
              df.explain("formatted")
              df.show(20, truncate = false)
            }
            val t0 = System.nanoTime()
            val rows = df.count()
            println(f"[explain] $n rows=$rows (${(System.nanoTime() - t0) / 1e9}%.2fs)")
          } catch {
            case e: Throwable =>
              println(s"[explain] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
