package graft

/** Dev utility: A/B-time registered queries under session-conf overrides.
  * usage: runMain graft.TimeOne q1 [q2 ...]  — times each query best-of-3
  * with spark.sql.codegen.maxFields at 100 (Spark default) vs 200.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = Explain.session()
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val n = sys.env.get("SPARK_GRAFT_HITS_N").map(_.toInt).getOrElse(graft.dialect.HitsFixture.BenchN)
    graft.dialect.HitsFixture.ensureScaled(spark, n)
    println("hits rows: " + spark.table("hits").count())
    args.foreach { name =>
      // A/B the lazy-materialization rewrite alongside the codegen
      // width sweep: latemat=off forces the single-pass plan
      for (mf <- Seq("100", "200"); lm <- Seq(true, false)) {
        spark.conf.set("spark.sql.codegen.maxFields", mf)
        graft.operators.LateMaterialize.enabled = lm
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          byName(name).run(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name maxFields=$mf latemat=$lm best=${times.min}%.2fs all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
      graft.operators.LateMaterialize.enabled = true
    }
    spark.stop()
  }
}
