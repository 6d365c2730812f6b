package graft

/** Dev utility: measure data-skipping indexes at scale.
  *
  * Builds an N-row MergeTree table in B insert batches — each batch a
  * disjoint `band` range, exactly one batch carrying a marker token in
  * its text column (the data-locality precondition skip indexes exist
  * for; uniformly mixed data cannot be file-pruned by ANY engine's
  * skip index, ClickHouse included — the synthetic hits fixture is
  * deliberately uniform, so this table is the honest scale probe).
  * Then times, best-of-3 each, with the prune rule ON vs OFF:
  *   - `txt LIKE '%marker%'` count (ngrambf_v1)
  *   - `band BETWEEN lo AND hi` sum (minmax)
  * plus a projection A/B on the same fixture (the low-cardinality
  * GROUP BY with count/sum/avg/uniq answered from the per-part store
  * vs the fact scan, Projections.enabled on/off), the one-off
  * MATERIALIZE costs, and manifest sizes.
  * Prints one JSON line (BASELINE.md records the round artifacts).
  *
  * usage: runMain graft.SkipBench [rows] [batches]
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(30L * 1000 * 1000)
    val batches = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = Explain.session()
    import graft.dialect.Engine
    val t = "graft_bench.skipscale"
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_bench")
    Engine.execute(spark, s"DROP TABLE IF EXISTS $t SYNC")
    Engine.execute(spark, s"""
      CREATE TABLE $t (k Int64, band Int64, bucket Int64, txt String)
      ENGINE=MergeTree() ORDER BY (k)""")
    val per = n / batches
    val tLoad0 = System.nanoTime()
    for (b <- 0 until batches) {
      val marker = if (b == batches / 2) "zqwhale " else ""
      Engine.execute(spark, s"""
        INSERT INTO $t
        SELECT number + ${b * per} AS k,
               number + ${b.toLong * 10_000_000_000L} AS band,
               number % 16 AS bucket,
               concat('$marker', 'record ', toString(number % 1000),
                      ' of batch ', toString(number % 37)) AS txt
        FROM numbers($per)""")
    }
    val loadSec = (System.nanoTime() - tLoad0) / 1e9
    val files = spark.table(t).inputFiles.length

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildNgram) = timed {
      Engine.execute(spark,
        s"ALTER TABLE $t ADD INDEX ix_ng txt TYPE ngrambf_v1(4, 16384, 2, 0)")
      Engine.execute(spark, s"ALTER TABLE $t MATERIALIZE INDEX ix_ng")
    }
    val (_, buildMinmax) = timed {
      Engine.execute(spark, s"ALTER TABLE $t ADD INDEX ix_band band TYPE minmax")
      Engine.execute(spark, s"ALTER TABLE $t MATERIALIZE INDEX ix_band")
    }

    val likeQ = s"SELECT count() AS c FROM $t WHERE txt LIKE '%zqwhale%'"
    val lo = (batches / 2).toLong * 10_000_000_000L + per / 4
    val hi = lo + per / 100
    val bandQ = s"SELECT count() AS c, sum(k) AS s FROM $t " +
      s"WHERE band >= $lo AND band <= $hi"

    def best3(q: String): (Double, Long) = {
      var rows = 0L
      val times = (1 to 3).map { _ =>
        val (r, sec) = timed(Engine.execute(spark, q).collect())
        rows = r.head.getLong(0)
        sec
      }
      (times.min, rows)
    }
    def ab(q: String): (Double, Double, Long, Long) = {
      graft.plans.SkipIndexPrune.enabled = true
      val (on, rowsOn) = best3(q)
      graft.plans.SkipIndexPrune.enabled = false
      val (off, rowsOff) = best3(q)
      graft.plans.SkipIndexPrune.enabled = true
      (on, off, rowsOn, rowsOff)
    }
    // projection A/B on the same fixture: the GROUP BY that reads the
    // per-part store (count/sum/avg/uniq partials) vs the fact scan
    val (_, buildProj) = timed {
      Engine.execute(spark, s"""
        ALTER TABLE $t ADD PROJECTION p_b
          (SELECT bucket, count(), sum(k), avg(k), uniq(txt)
           GROUP BY bucket)""")
      Engine.execute(spark, s"ALTER TABLE $t MATERIALIZE PROJECTION p_b")
    }
    val projQ = s"SELECT bucket, count() AS n, sum(k) AS sk, " +
      s"avg(k) AS ak, uniq(txt) AS u FROM $t GROUP BY bucket ORDER BY bucket"
    def best3Rows(q: String): Double =
      (1 to 3).map(_ => timed(Engine.execute(spark, q).collect())._2).min
    graft.dialect.Projections.enabled = true
    val dfProj = Engine.execute(spark, projQ)
    require(dfProj.queryExecution.analyzed.toString.contains("__proj_p_b"),
      "projection rewrite did not fire in the bench")
    val projOn = best3Rows(projQ)
    graft.dialect.Projections.enabled = false
    val projOff = best3Rows(projQ)
    graft.dialect.Projections.enabled = true

    val (likeOn, likeOff, lr1, lr2) = ab(likeQ)
    require(lr1 == lr2, s"pruned LIKE changed the answer: $lr1 vs $lr2")
    val likeKept = graft.plans.SkipIndexPrune.lastPruneFor(t)
    val (bandOn, bandOff, br1, br2) = ab(bandQ)
    require(br1 == br2, s"pruned range changed the answer: $br1 vs $br2")
    val kept = graft.plans.SkipIndexPrune.lastPruneFor(t)

    // manifest footprint: what the driver holds + what persists
    val loc = new java.io.File(new java.net.URI(
      spark.table(t).inputFiles.head).getPath).getParentFile
    val manifest = new java.io.File(loc, "_graft_skipidx/indexes.json")
    println(f"""{"metric":"skip_index_scale","rows":$n,"batches":$batches,"files":$files,"load_sec":$loadSec%.1f,"materialize_ngram_sec":$buildNgram%.1f,"materialize_minmax_sec":$buildMinmax%.1f,"materialize_proj_sec":$buildProj%.1f,"proj_rewrite_sec":$projOn%.3f,"proj_full_sec":$projOff%.2f,"proj_speedup":${projOff / projOn}%.1f,"like_pruned_sec":$likeOn%.2f,"like_full_sec":$likeOff%.2f,"like_speedup":${likeOff / likeOn}%.2f,"band_pruned_sec":$bandOn%.2f,"band_full_sec":$bandOff%.2f,"band_speedup":${bandOff / bandOn}%.2f,"like_kept":${likeKept.map(_._1).getOrElse(-1)},"like_total":${likeKept.map(_._2).getOrElse(-1)},"band_kept":${kept.map(_._1).getOrElse(-1)},"band_total":${kept.map(_._2).getOrElse(-1)},"manifest_bytes":${manifest.length()},"like_rows":$lr1,"band_rows":$br1}""")
    Engine.execute(spark, s"DROP TABLE IF EXISTS $t SYNC")
    spark.stop()
  }
}
