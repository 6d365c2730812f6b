package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact top-k cosine for a (small, broadcast) set
  *    of query vectors — one pass over the corpus, per-query top-k via
  *    window. This is the 100 TB baseline when |queries| is small: the
  *    corpus is never shuffled, only scanned.
  *  - `lshTopK`: sign-LSH (random-hyperplane) bucketed ANN — corpus is
  *    hashed once into 2^planes buckets; each query probes its own
  *    bucket plus all Hamming-1 neighbors and reranks exactly within
  *    candidates. Approximate (no oracle); recall is asserted in tests.
  *
  * All arithmetic is double-precision with a fixed left-to-right fold,
  * so the DuckDB oracle (list_inner_product on DOUBLE[]) matches
  * bit-for-bit; ranking uses the ROUNDED similarity + id so order is
  * engine-independent.
  */
object CosineKnn {

  private def asDouble(c: String) = expr(s"transform($c, x -> cast(x AS DOUBLE))")
  private def dot(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 AS DOUBLE), (acc, x) -> acc + x)")

  /** (qid, nid, sim, rn): top-k neighbors by cosine for each query row.
    * `queries` must be small enough to broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(vecCol).as("nv"))
      .withColumn("nn", sqrt(dot("nv", "nv")))
    val q = queries.select(col(idCol).as("qid"), asDouble(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot("qv", "qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", round(dot("qv", "nv") / (col("qn") * col("nn")), 6))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived uniform in [-0.5, 0.5). */
  private def planesLit(nPlanes: Int, dim: Int) = {
    val comps = (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane:$p:dim:$j".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
      }
    }
    typedlit(comps.map(_.toArray).toArray)
  }

  /** Sign-LSH bucket id (0 until 2^nPlanes) for each vector. */
  private def withBucket(df: DataFrame, vecCol: String,
                         nPlanes: Int, dim: Int): DataFrame =
    df.withColumn("planes", planesLit(nPlanes, dim))
      .withColumn("bucket", expr(
        s"""aggregate(sequence(0, $nPlanes - 1), 0,
              (acc, p) -> acc + CASE WHEN
                aggregate(zip_with($vecCol, element_at(planes, p + 1),
                  (x, h) -> cast(x AS DOUBLE) * h),
                  cast(0 AS DOUBLE), (a, x) -> a + x) > 0
              THEN shiftleft(1, p) ELSE 0 END)"""))
      .drop("planes")

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= the
    * threshold. Exact block-join formulation — normalize once, join,
    * dot of unit vectors. Cosine thresholds admit no lossless bucketing
    * (unlike SimHash/prefix filtering), so the exact variant is
    * inherently quadratic: use it for bounded corpora/blocks, and the
    * LSH/IVF paths when approximate recall is acceptable at scale.
    * Ranking/filter uses the ROUNDED similarity so results are
    * engine-independent. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val u = corpus.select(col(idCol).as("id"), asDouble(vecCol).as("v"))
      .withColumn("n", sqrt(dot("v", "v")))
      .select(col("id"), expr("transform(v, x -> x / n)").as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    u.select(col("id").as("a"), col("u").as("ua"))
      .join(u.select(col("id").as("b"), col("u").as("ub")), col("a") < col("b"))
      .withColumn("sim", round(dot("ua", "ub"), 6))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** IVF-style ANN: a KMeans coarse quantizer partitions the corpus
    * into nLists inverted lists; each query probes the nProbe nearest
    * centroids and reranks exactly within those lists. The 100 TB
    * shape: centroids are tiny (broadcast), the corpus is scanned once
    * to assign lists and thereafter only probed lists are read —
    * with a list-partitioned layout that's partition pruning.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nLists: Int = 16,
              nProbe: Int = 6): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(idCol).as("nid"), asDouble(vecCol).as("nv"))
      .withColumn("features", array_to_vector(col("nv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val km = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10).fit(c)
    val lists = km.transform(c).select(col("nid"), col("nv"),
        col("prediction").as("list"))
      .withColumn("nn", sqrt(dot("nv", "nv")))
    val centers = typedlit(km.clusterCenters.map(_.toArray))
    val q = queries.select(col(idCol).as("qid"), asDouble(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot("qv", "qv")))
      .withColumn("__centers", centers)
      // nProbe nearest centroids by squared L2 (struct sort on dist)
      .withColumn("probe", explode(expr(
        s"""transform(slice(array_sort(
              transform(sequence(0, $nLists - 1), i -> struct(
                aggregate(zip_with(qv, element_at(__centers, i + 1),
                  (x, y) -> (x - y) * (x - y)), cast(0 AS DOUBLE), (a, x) -> a + x) AS d,
                i AS idx))), 1, $nProbe), s -> s.idx)""")))
      .drop("__centers")
    val scored = lists.join(broadcast(q), col("list") === col("probe"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", round(dot("qv", "nv") / (col("qn") * col("nn")), 6))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rn"))
  }

  /** ANN top-k: bucket + multiprobe (all buckets within Hamming
    * distance `probeDist` of the query's bucket), exact rerank within
    * candidates. probeDist=2 with 4 planes probes 11/16 buckets — on
    * uniformly random vectors (the fixture: max cosine ~0.5, i.e. no
    * cluster structure, LSH's worst case) that yields ~0.84 recall@5;
    * real embedding corpora cluster, so fewer probes / more planes do
    * better. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 4,
              dim: Int = 64, probeDist: Int = 2): DataFrame = {
    val c = withBucket(
      corpus.select(col(idCol).as("nid"), asDouble(vecCol).as("nv")),
      "nv", nPlanes, dim).withColumn("nn", sqrt(dot("nv", "nv")))
    val q = withBucket(
      queries.select(col(idCol).as("qid"), asDouble(vecCol).as("qv")),
      "qv", nPlanes, dim).withColumn("qn", sqrt(dot("qv", "qv")))
      .withColumnRenamed("bucket", "qbucket")
      // multiprobe: every bucket within probeDist bit flips
      .withColumn("probe", explode(expr(
        s"""filter(sequence(0, ${(1 << nPlanes) - 1}),
               b -> bit_count(int(b) ^ qbucket) <= $probeDist)""")))
      .drop("qbucket")
    val scored = c.join(broadcast(q), col("bucket") === col("probe"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", round(dot("qv", "nv") / (col("qn") * col("nn")), 6))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rn"))
  }
}
