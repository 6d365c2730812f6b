package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch A/B harness for the optimization round: times named
  * experiment variants (best-of-N noop) in one JVM so ambient load
  * cancels out. Not part of the driver contract.
  *
  * usage: runMain graft.DevAb <experiment>
  */
object DevAb {
  def time(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[devab] $label best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
  }

  /** Interleaved A/B: alternates the variants so ambient-load drift
    * hits both equally; prints best + all per variant. */
  def ab(reps: Int, variants: (String, () => DataFrame)*): Unit = {
    val samples = variants.map(_ => scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { _ =>
      variants.zipWithIndex.foreach { case ((_, mk), i) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        samples(i) += (System.nanoTime() - t0) / 1e9
      }
    }
    variants.zipWithIndex.foreach { case ((label, _), i) =>
      println(f"[devab] $label best=${samples(i).min}%.3f " +
        f"med=${samples(i).sorted.apply(reps / 2)}%.3f " +
        s"all=${samples(i).map(t => f"$t%.3f").mkString(",")}")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Explain.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.headOption.getOrElse("g2") match {
      case "g2" => g2Variants(spark, dir)
      case "cb23" => cb23Variants(spark)
      case "reuse" => reuseCheck(spark, dir)
      case "l34" => l34Variants(spark, dir)
      case "l23" => l23Variants(spark, dir)
      case "floor" => floorSweep(spark)
      case "floorSmall" => floorSmallSweep(spark)
      case "phases" => phaseBreakdown(spark, dir)
      case "l23fan" => l23Fan(spark, dir)
      case "opfan" => opFan(spark, dir)
      case "l2parts" => l2Parts(spark, dir)
      case "l4parts" => l4Parts(spark, dir)
      case "l4stages" => l4Stages(spark, dir)
      case other => sys.error(s"unknown experiment $other")
    }
    spark.stop()
  }

  /** Stage-level timing of ONE real l4 run via a SparkListener. */
  private def l4Stages(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, si.name.take(60), dur, si.numTasks))
      }
    }
    // warm first
    SparkEntry.all.find(_.name == "l4_ngram_simjoin").get.run(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.all.find(_.name == "l4_ngram_simjoin").get.run(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"[devab] l4 run ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    stages.sortBy(-_._3).take(12).foreach { case (id, name, dur, nt) =>
      println(f"[devab] stage $id%4d ${dur}%6d ms tasks=$nt%3d  $name")
    }
    spark.sparkContext.removeSparkListener(listener)
  }

  /** Where does l4's time go? Replicates ngramJaccardPairs stage by
    * stage with counts. */
  private def l4Parts(spark: SparkSession, dir: String): Unit = {
    import graft.functions.TextFns
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val n = 4; val threshold = 0.8
    var t0 = System.nanoTime()
    val sp = Tables.spread(docs)
    println(f"[devab] spread ${(System.nanoTime() - t0) / 1e9}%.2f parts=${sp.rdd.getNumPartitions}")
    t0 = System.nanoTime()
    sp.select(col("doc_id").as("id"),
        TextFns.norm(col("text")).as("nrm"))
      .write.format("noop").mode("overwrite").save()
    println(f"[devab] norm_only ${(System.nanoTime() - t0) / 1e9}%.2f")
    t0 = System.nanoTime()
    sp.select(col("doc_id").as("id"),
        split(TextFns.norm(col("text")), "").as("chars"))
      .write.format("noop").mode("overwrite").save()
    println(f"[devab] split_chars ${(System.nanoTime() - t0) / 1e9}%.2f")
    t0 = System.nanoTime()
    sp.select(col("doc_id").as("id"), col("lang").as("block"),
        TextFns.charNgrams(TextFns.norm(col("text")), n).as("grams"))
      .write.format("noop").mode("overwrite").save()
    println(f"[devab] grams_noop ${(System.nanoTime() - t0) / 1e9}%.2f")
    t0 = System.nanoTime()
    val base = sp
      .select(col("doc_id").as("id"), col("lang").as("block"),
        TextFns.charNgrams(TextFns.norm(col("text")), n).as("grams"))
      .localCheckpoint(true)
    println(f"[devab] base_ckpt ${(System.nanoTime() - t0) / 1e9}%.2f n=${base.count()}")
    val exploded = base.select(col("id"), col("block"),
      size(col("grams")).as("sz"), explode(col("grams")).as("g"))
    val freq = exploded.groupBy(col("g")).agg(count(lit(1)).as("freq"))
    val ranked = exploded.join(freq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("freq").asc, col("g").asc)))
    t0 = System.nanoTime()
    val prefix = ranked.filter(
      col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .localCheckpoint(true)
    println(f"[devab] prefix_ckpt ${(System.nanoTime() - t0) / 1e9}%.2f n=${prefix.count()}")
    t0 = System.nanoTime()
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.block") === col("y.block") && col("x.g") === col("y.g") &&
          col("x.id") < col("y.id") &&
          col("y.sz") >= lit(threshold) * col("x.sz") &&
          col("x.sz") >= lit(threshold) * col("y.sz"))
      .select(col("x.block").as("block"), col("x.id").as("a"), col("y.id").as("b"))
      .distinct().localCheckpoint(true)
    println(f"[devab] cands_ckpt ${(System.nanoTime() - t0) / 1e9}%.2f n=${cands.count()}")
    t0 = System.nanoTime()
    val sets = base.select(col("id"), col("grams"))
    val fin = cands
      .join(sets.select(col("id").as("a"), col("grams").as("ga")), "a")
      .join(sets.select(col("id").as("b"), col("grams").as("gb")), "b")
      .withColumn("jac", TextFns.jaccard(col("ga"), col("gb")))
      .filter(col("jac") >= threshold)
    fin.write.format("noop").mode("overwrite").save()
    println(f"[devab] verify_noop ${(System.nanoTime() - t0) / 1e9}%.2f")
  }

  /** Where does l2's time go? Times each pipeline stage separately. */
  private def l2Parts(spark: SparkSession, dir: String): Unit = {
    import graft.operators.MinHashLsh
    import graft.functions.TextFns
    val docs = Tables.load(spark, dir, "documents")
    def stage(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devab] $label best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val toks = TextFns.tokens(TextFns.norm(col("text")))
    val shPlan = Tables.spread(docs).select(col("doc_id").as("id"),
      TextFns.wordShingles(toks, 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    println("[devab] spread-shingles plan:\n" +
      shPlan.queryExecution.executedPlan.toString.linesIterator
        .take(12).mkString("\n"))
    stage("spread_shingles")(shPlan)
    stage("shingles_only")(docs.select(col("doc_id").as("id"),
      TextFns.wordShingles(toks, 3).as("shingles"))
      .filter(size(col("shingles")) > 0))
    stage("signatures")(MinHashLsh.signatures(docs, "doc_id", "text", 3, 64))
    stage("cand_pairs")(
      MinHashLsh.candidatePairs(
        MinHashLsh.signatures(docs, "doc_id", "text", 3, 64), 16, 4))
    stage("full_neardup")(
      MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8))
    val sigs = MinHashLsh.signatures(docs, "doc_id", "text", 3, 64)
    println("[devab] n_docs=" + docs.count() +
      " n_sig=" + sigs.count() +
      " n_cand=" + MinHashLsh.candidatePairs(sigs, 16, 4).count() +
      " avg_shingles=" + sigs.select(avg(size(col("hs")))).head.getDouble(0))
  }

  /** How much of the cb sweep is scan-task scheduling overhead? Times a
    * representative subset under different maxPartitionBytes (the bench
    * derives splits as hitsBytes/(cpus*waves); this sweeps waves). */
  private def floorSweep(spark: SparkSession): Unit = {
    graft.dialect.HitsFixture.ensureScaled(spark)
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val subset = Seq("cb19_point_user", "cb00_count", "cb07_adv_group",
      "cb12_top_phrases", "cb18_user_minute", "cb09_region_wide",
      "cb33_top_urls", "cb20_url_like", "cb28_referer_domain",
      "cb35_ip_arith", "cb29_ninety_sums", "cb23_star_scan")
    val settings = Seq("2m" -> (2L << 20), "6m" -> (6L << 20),
      "16m" -> (16L << 20))
    // warmup
    subset.foreach(n => byName(n).run(spark, "")
      .write.format("noop").mode("overwrite").save())
    val totals = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      settings.foreach { case (label, bytes) =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
        val t0 = System.nanoTime()
        subset.foreach(n => byName(n).run(spark, "")
          .write.format("noop").mode("overwrite").save())
        totals(label) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
    settings.foreach { case (label, _) =>
      val ts = totals(label)
      println(f"[devab] floor maxPartitionBytes=$label subset_total best=${ts.min}%.2f all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
  }

  /** r16: with the operator map stages now codegen (explode + md5, no
    * HOF fold), is spread's eager CHECKPOINT still needed, or does a
    * bare repartition parallelize the map just as well? Pre-
    * repartitioning the input makes the operators' internal spread a
    * no-op (partition count >= slots), so variant B measures
    * repartition-without-checkpoint against A's spread-with-checkpoint
    * on identical operator code. */
  private def opFan(spark: SparkSession, dir: String): Unit = {
    import graft.operators.{MinHashLsh, SimilarityJoin}
    val slots = spark.sparkContext.defaultParallelism
    def docs = Tables.load(spark, dir, "documents")
    ab(6,
      "l2_spread" -> (() =>
        MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)),
      "l2_repart" -> (() =>
        MinHashLsh.nearDupPairs(docs.repartition(slots), "doc_id", "text", 0.8)))
    ab(4,
      "l4_spread" -> (() => SimilarityJoin.ngramJaccardPairs(
        docs, "doc_id", "text", "lang", 4, 0.8)),
      "l4_repart" -> (() => SimilarityJoin.ngramJaccardPairs(
        docs.repartition(slots), "doc_id", "text", "lang", 4, 0.8)))
  }

  /** r16: is spread's eager checkpoint needed for FILTER-FREE tokenize
    * pipelines (l23 shape), or does a bare repartition parallelize the
    * tokenize just as well (no filter exists to be pushed below the
    * round-robin exchange) minus the materialization cost? */
  private def l23Fan(spark: SparkSession, dir: String): Unit = {
    import graft.functions.TextFns
    import org.apache.spark.sql.expressions.Window
    val slots = spark.sparkContext.defaultParallelism
    def pipeline(d0: DataFrame): DataFrame = {
      val d = d0.withColumn("__norm", TextFns.norm(col("text")))
        .withColumn("__toks", TextFns.tokens(col("__norm")))
      val tf = d.select(col("doc_id"), explode(col("__toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(broadcast(dfreq), "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rn"))
        .orderBy("doc_id", "rn")
    }
    def raw = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    ab(8,
      "l23_spread" -> (() => pipeline(Tables.spread(raw))),
      "l23_repart" -> (() => pipeline(raw.repartition(slots))),
      "l23_nofan" -> (() => pipeline(raw)))
  }

  /** r16 verdict item 6: where does the ~0.15 s per-query floor sit?
    * Splits each near-floor query's wall time into DataFrame
    * construction (view registration / transpile / analysis),
    * physical planning, and execution (noop write, incl. AQE rounds
    * and task waves). */
  private def phaseBreakdown(spark: SparkSession, dir: String): Unit = {
    graft.dialect.HitsFixture.ensureScaled(spark)
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val names = Seq("g1_count", "g13_topk", "b1_cb_filtered_count",
      "cb00_count", "cb19_point_user", "cb36_pageviews_url", "g5_groupby_expr")
    names.foreach(n => byName(n).run(spark, dir)
      .write.format("noop").mode("overwrite").save()) // warm
    names.foreach { n =>
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = byName(n).run(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val best = samples.minBy(s => s._1 + s._2 + s._3)
      println(f"[devab] phases $n construct=${best._1}%.3f plan=${best._2}%.3f exec=${best._3}%.3f " +
        f"(med total=${samples.map(s => s._1 + s._2 + s._3).sorted.apply(2)}%.3f)")
    }
  }

  /** r16 verdict item 8: does the 6 MB split-floor retune cost the
    * SUB-0.5s cb point queries real parallelism at the 3M fixture?
    * Interleaved per-query A/B of 2m vs 6m on exactly the queries the
    * r15 driver artifact regressed. */
  private def floorSmallSweep(spark: SparkSession): Unit = {
    graft.dialect.HitsFixture.ensureScaled(spark)
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val subset = Seq("cb00_count", "cb01_adv_count", "cb06_minmax_date",
      "cb07_adv_group", "cb19_point_user")
    val settings = Seq("2m" -> (2L << 20), "6m" -> (6L << 20))
    subset.foreach(n => byName(n).run(spark, "")
      .write.format("noop").mode("overwrite").save())
    val samples = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      settings.foreach { case (label, bytes) =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
        subset.foreach { n =>
          val t0 = System.nanoTime()
          byName(n).run(spark, "").write.format("noop").mode("overwrite").save()
          samples((n, label)) ::= (System.nanoTime() - t0) / 1e9
        }
      }
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
    subset.foreach { n =>
      val line = settings.map { case (label, _) =>
        val ts = samples((n, label))
        f"$label best=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f"
      }.mkString("  ")
      println(s"[devab] floorSmall $n  $line")
    }
  }

  /** Does AQE stage reuse dedupe the twice-planned tf subtree of l23
    * (and friends)? Prints the executed plan's reuse node counts. */
  private def reuseCheck(spark: SparkSession, dir: String): Unit = {
    Seq("l23_tfidf_topterms", "l34_dsir_resample", "l24_bigram_lm_score")
      .foreach { name =>
        val q = SparkEntry.all.find(_.name == name).get
        val df = q.run(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val p = df.queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        println(s"[devab] $name scans=${c("Scan parquet")} " +
          s"reusedExchange=${c("ReusedExchange")} " +
          s"reusedStage=${c("ReusedQueryStage")} tableCache=${c("InMemoryTableScan")}")
      }
  }

  /** l34: current (fused qc/pc) vs single-tokenize-pass via per-doc
    * bucket counts (tfb) with stage reuse. */
  private def l34Variants(spark: SparkSession, dir: String): Unit = {
    import graft.functions.TextFns
    graft.dialect.ChFunctions.register(spark)
    val B = 64
    def toks = Tables.load(spark, dir, "documents")
      .withColumn("__norm", TextFns.norm(col("text")))
      .withColumn("__toks", TextFns.tokens(col("__norm")))
      .select(col("doc_id"), col("lang"), explode(col("__toks")).as("token"))
      .withColumn("b", expr(s"md5Prefix60(token) % $B"))

    def current = SparkEntry.all.find(_.name == "l34_dsir_resample").get
      .run(spark, dir)

    def v2 = {
      val tfb = toks.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
      val counts = tfb.groupBy("b").agg(sum(col("c")).as("qc"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("pc"))
      val totals = counts.agg(sum(col("qc")).as("qtot"),
        sum(col("pc")).as("ptot"))
      val lr = counts.crossJoin(broadcast(totals))
        .select(col("b"),
          (log((col("pc") + 1.0) / (col("ptot") + B)) -
           log((col("qc") + 1.0) / (col("qtot") + B))).as("lr"))
      val w = tfb.join(broadcast(lr), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("lr") * col("c")).as("w"))
      val key = (col("w") -
        log(-log((expr("md5Prefix60(cast(doc_id AS string))") % 1000000 +
          0.5) / 1000000.0))).as("gkey")
      w.select(col("doc_id"), col("w"), key)
        .orderBy(col("gkey").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), round(col("w"), 3).as("w"))
        .orderBy(col("doc_id"))
    }
    // v3: one true tokenize pass — tfb materialized via localCheckpoint
    // (computed inside the run, from parquet; nothing survives the run)
    def v3 = {
      val tfb = toks.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val counts = tfb.groupBy("b").agg(sum(col("c")).as("qc"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("pc"))
      val totals = counts.agg(sum(col("qc")).as("qtot"),
        sum(col("pc")).as("ptot"))
      val lr = counts.crossJoin(broadcast(totals))
        .select(col("b"),
          (log((col("pc") + 1.0) / (col("ptot") + B)) -
           log((col("qc") + 1.0) / (col("qtot") + B))).as("lr"))
      val w = tfb.join(broadcast(lr), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("lr") * col("c")).as("w"))
      val key = (col("w") -
        log(-log((expr("md5Prefix60(cast(doc_id AS string))") % 1000000 +
          0.5) / 1000000.0))).as("gkey")
      w.select(col("doc_id"), col("w"), key)
        .orderBy(col("gkey").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), round(col("w"), 3).as("w"))
        .orderBy(col("doc_id"))
    }
    ab(8, "l34_current" -> (() => current), "l34_v2_tfb" -> (() => v2),
      "l34_v3_ckpt" -> (() => v3))
    val a = current.collect().map(_.toString).mkString("\n")
    val b = v2.collect().map(_.toString).mkString("\n")
    val c = v3.collect().map(_.toString).mkString("\n")
    println(s"[devab] identical_v2=${a == b} identical_v3=${a == c}")
    if (a != b) println("current:\n" + a + "\nv2:\n" + b)
  }

  /** l23: second tokenize pass for document frequencies vs a window
    * count over the tf groups (df = rows per term in tf). */
  private def l23Variants(spark: SparkSession, dir: String): Unit = {
    import graft.functions.TextFns
    import org.apache.spark.sql.expressions.Window
    def docsWithToks = Tables.load(spark, dir, "documents")
      .withColumn("__norm", TextFns.norm(col("text")))
      .withColumn("__toks", TextFns.tokens(col("__norm")))

    def current = SparkEntry.all.find(_.name == "l23_tfidf_topterms").get
      .run(spark, dir)

    def v2 = {
      val tf = docsWithToks
        .select(col("doc_id"), explode(col("__toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val n = Tables.load(spark, dir, "documents")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rn"))
        .orderBy("doc_id", "rn")
    }
    ab(8, "l23_current" -> (() => current), "l23_v2_window" -> (() => v2))
    val a = current.collect().map(_.toString).mkString("\n")
    val b = v2.collect().map(_.toString).mkString("\n")
    println(s"[devab] identical_v2=${a == b}")
    if (a != b) println("sizes " + a.length + " " + b.length)
  }

  /** cb23 latemat on/off, interleaved reps to see the variance source. */
  private def cb23Variants(spark: SparkSession): Unit = {
    graft.dialect.HitsFixture.ensureScaled(spark)
    val q = SparkEntry.all.find(_.name == "cb23_star_scan").get
    def once(label: String): Double = {
      val t0 = System.nanoTime()
      q.run(spark, "").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val on = scala.collection.mutable.ArrayBuffer.empty[Double]
    val off = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 8).foreach { _ =>
      graft.operators.LateMaterialize.enabled = true
      on += once("on")
      graft.operators.LateMaterialize.enabled = false
      off += once("off")
    }
    graft.operators.LateMaterialize.enabled = true
    println(f"[devab] cb23 latemat=on  best=${on.min}%.3f all=${on.map(t => f"$t%.3f").mkString(",")}")
    println(f"[devab] cb23 latemat=off best=${off.min}%.3f all=${off.map(t => f"$t%.3f").mkString(",")}")
  }

  /** How much of g2's runtime is decimal arithmetic? */
  private def g2Variants(spark: SparkSession, dir: String): Unit = {
    import Tables.{dec, avgDec, ts}
    def base = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2000-09-02"))

    def current = {
      val price = dec(col("l_extendedprice"))
      val disc = dec(col("l_discount"), 4, 2)
      val tax = dec(col("l_tax"), 4, 2)
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"),
          sum(price).cast("decimal(18,2)").as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast("decimal(18,4)").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("decimal(18,6)").as("sum_charge"),
          avgDec(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_extendedprice")).as("avg_price"),
          avgDec(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    // all-double variant (NOT result-identical; bounds the decimal cost)
    def doubles = base.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

    // scaled-long variant: exact integer arithmetic on cents
    def longs = {
      val qty = round(col("l_quantity") * 100).cast("long")
      val price = round(col("l_extendedprice") * 100).cast("long")
      val disc = round(col("l_discount") * 100).cast("long")
      val tax = round(col("l_tax") * 100).cast("long")
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).as("sq"), sum(price).as("sp"),
          sum(price * (lit(100L) - disc)).as("sdp"),
          sum(price * (lit(100L) - disc) * (lit(100L) + tax)).as("sch"),
          sum(disc).as("sd"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("sq").cast("decimal(20,0)") / 100).cast("decimal(18,2)").as("sum_qty"),
          (col("sp").cast("decimal(20,0)") / 100).cast("decimal(18,2)").as("sum_base_price"),
          (col("sdp").cast("decimal(24,0)") / 10000).cast("decimal(18,4)").as("sum_disc_price"),
          (col("sch").cast("decimal(28,0)") / 1000000).cast("decimal(18,6)").as("sum_charge"),
          round(col("sq").cast("double") / 100 / col("n"), 6).as("avg_qty"),
          round(col("sp").cast("double") / 100 / col("n"), 6).as("avg_price"),
          round(col("sd").cast("double") / 100 / col("n"), 6).as("avg_disc"),
          col("n").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    // hybrid: long arithmetic only for the product sums (whose declared
    // output range a long covers); plain decimal sums stay (compact
    // fast-path adds, and decimal(18,2) outranges a cents-long)
    def hybrid = {
      def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
      val pC = cents(col("l_extendedprice"))
      val dC = cents(col("l_discount"))
      val tC = cents(col("l_tax"))
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("decimal(18,2)").as("sum_base_price"),
          (sum(pC * (lit(100L) - dC)).cast("decimal(24,0)") / 10000)
            .cast("decimal(18,4)").as("sum_disc_price"),
          (sum(pC * (lit(100L) - dC) * (lit(100L) + tC)).cast("decimal(28,0)") / 1000000)
            .cast("decimal(18,6)").as("sum_charge"),
          avgDec(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_extendedprice")).as("avg_price"),
          avgDec(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    // longdec: per-row scaled-long arithmetic (no double->BigDecimal
    // cast, no BigDecimal multiply), summed as decimal(>=18,0) cents —
    // compact fast-path adds with 1e26+ headroom (a strict superset of
    // every declared output domain) — rescaled once per group.
    def longdec = {
      def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
      val qC = cents(col("l_quantity"))
      val pC = cents(col("l_extendedprice"))
      val dC = cents(col("l_discount"))
      val tC = cents(col("l_tax"))
      val sq = sum(qC.cast("decimal(18,0)"))
      val sp = sum(pC.cast("decimal(18,0)"))
      val sd = sum(dC.cast("decimal(18,0)"))
      val n = count(lit(1))
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sq / 100).cast("decimal(18,2)").as("sum_qty"),
          (sp / 100).cast("decimal(18,2)").as("sum_base_price"),
          (sum((pC * (lit(100L) - dC)).cast("decimal(20,0)")) / 10000)
            .cast("decimal(18,4)").as("sum_disc_price"),
          (sum((pC * (lit(100L) - dC) * (lit(100L) + tC)).cast("decimal(22,0)")) / 1000000)
            .cast("decimal(18,6)").as("sum_charge"),
          round((sq / 100).cast("double") / n, 6).as("avg_qty"),
          round((sp / 100).cast("double") / n, 6).as("avg_price"),
          round((sd / 100).cast("double") / n, 6).as("avg_disc"),
          n.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    time("g2_current")(current)
    time("g2_doubles")(doubles)
    time("g2_scaled_longs")(longs)
    time("g2_hybrid")(hybrid)
    time("g2_longdec")(longdec)
    time("g2_current2")(current)
    // value check: do long sums agree with the decimal sums?
    val a = current.collect().map(_.toString).mkString("\n")
    val b = longs.collect().map(_.toString).mkString("\n")
    val c = hybrid.collect().map(_.toString).mkString("\n")
    val d = longdec.collect().map(_.toString).mkString("\n")
    println(s"[devab] identical_longs=${a == b} identical_hybrid=${a == c} identical_longdec=${a == d}")
    if (a != d) {
      println("[devab] current:\n" + a)
      println("[devab] longdec:\n" + d)
    }
  }
}
