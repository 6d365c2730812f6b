package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev utility for the optimization rounds: time registered queries
  * (best-of-N noop writes, guide §1.4) and dump their formatted plans
  * to plans/<tag>/<name>_<suffix>.txt so before/after plan diffs are
  * committable evidence.
  *
  * usage: runMain graft.Probe <suffix> <queryName ...>
  *   env SPARK_GRAFT_SF_DIR  fixture dir (default /root/testdata/sf0.1)
  *   env SPARK_GRAFT_HITS_N  hits fixture rows (default BenchN)
  *   env PROBE_REPS          timing repetitions (default 5)
  *   env PROBE_PLANS_DIR     plan output dir (default plans/r15)
  *
  * Prints one line per query: name, best, all samples. Plans are the
  * pre-execution adaptive plans (AQE on), same session config as Bench.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: Probe <suffix> <query ...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PROBE_REPS", "5").toInt
    val plansDir = java.nio.file.Paths.get(
      sys.env.getOrElse("PROBE_PLANS_DIR", "plans/r15"))
    java.nio.file.Files.createDirectories(plansDir)
    val spark = Explain.session()
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    if (names.exists(_.startsWith("cb"))) {
      val n = sys.env.get("SPARK_GRAFT_HITS_N").map(_.toInt)
        .getOrElse(graft.dialect.HitsFixture.BenchN)
      graft.dialect.HitsFixture.ensureScaled(spark, n)
    }
    names.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query: $name"))
      spark.sparkContext.setJobDescription(s"probe:$name")
      val df = q.run(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        plansDir.resolve(s"${name}_$suffix.txt"), plan)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
