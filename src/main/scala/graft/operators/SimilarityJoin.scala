package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns

/** Exact set-similarity self-join on character n-grams with prefix
  * filtering (PPJoin-style), optionally blocked by a partition column.
  *
  * Prefix filter: order each doc's n-grams by ascending global
  * frequency (rarest first; ties by n-gram). Any pair with Jaccard >= t
  * must share one of each side's first m = |A| - ceil(t*|A|) + 1
  * n-grams, so indexing ONLY the prefix is lossless — recall is exactly
  * 1 and the brute-force oracle matches deterministically.
  *
  * Scale: this is what kills the hot-bucket problem of a naive inverted
  * index — ubiquitous n-grams ("the ") sit at the END of the frequency
  * order and never enter the index, so no bucket degenerates into an
  * all-pairs join. Shuffles: global n-gram count (1), frequency-rank
  * window per doc (1), candidate equi-join (1), two verify joins.
  */
object SimilarityJoin {

  /** (block, a, b, jac) for pairs in the same block with char-n-gram
    * Jaccard >= threshold. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int,
                        threshold: Double): DataFrame = {
    // persisted: reused by the frequency count, both prefix-join sides,
    // and both verify joins — recomputing the n-gram arrays 5x is the
    // dominant cost otherwise
    val base = docs.select(col(idCol).as("id"), col(blockCol).as("block"),
        TextFns.charNgrams(TextFns.norm(col(textCol)), n).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val exploded = base.select(col("id"), col("block"),
      size(col("grams")).as("sz"), explode(col("grams")).as("g"))

    // global frequency => deterministic rarity order (freq, gram)
    val freq = exploded.groupBy(col("g")).agg(count(lit(1)).as("freq"))
    val ranked = exploded.join(freq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("freq").asc, col("g").asc)))

    // prefix length m = sz - ceil(t*sz) + 1
    val prefix = ranked.filter(
      col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)

    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.block") === col("y.block") && col("x.g") === col("y.g") &&
          col("x.id") < col("y.id"))
      .select(col("x.block").as("block"), col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

    val sets = base.select(col("id"), col("grams"))
    cands
      .join(sets.select(col("id").as("a"), col("grams").as("ga")), "a")
      .join(sets.select(col("id").as("b"), col("grams").as("gb")), "b")
      .withColumn("jac", TextFns.jaccard(col("ga"), col("gb")))
      .filter(col("jac") >= threshold)
      .select(col("block"), col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }
}
