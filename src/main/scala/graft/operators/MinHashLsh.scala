package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** MinHash + LSH banding near-duplicate detection.
  *
  * Shape (reference treats dedup as out-of-scope/delegated; this is the
  * standard Broder MinHash construction, built Spark-first):
  *
  *   1. per doc: distinct word w-shingles                       (no shuffle)
  *   2. per doc: k minhashes; hash_i(s) = md5(s + "#" + i), min
  *      taken lexicographically over the hex strings             (no shuffle)
  *   3. band keys: md5 of r consecutive signature slots; explode
  *      to (band, key, id)                                       (1 shuffle: self-join on band key)
  *   4. candidate pairs = same (band, key), a < b, distinct
  *   5. verify with EXACT shingle-set Jaccard >= threshold       (2 keyed joins to refetch shingles)
  *
  * At 100 TB: no all-pairs anything — candidate generation is a keyed
  * equi-join whose bucket sizes are bounded by true duplicate-cluster
  * sizes (a hot bucket means the docs really are near-identical), and
  * the verify step touches only candidate pairs. The md5 minhash is the
  * oracle-parity path; swapping in xxhash64 for speed changes no
  * structure.
  *
  * Recall: a pair at Jaccard j survives banding with
  * p = 1-(1-j^r)^bands; at j=0.95, r=4, bands=16 => 1 - 2e-13.
  */
object MinHashLsh {

  /** (id, shingles, sig) for each input row. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleWidth: Int = 3, k: Int = 64): DataFrame = {
    val toks = TextFns.tokens(TextFns.norm(col(textCol)))
    docs.select(col(idCol).as("id"),
        TextFns.wordShingles(toks, shingleWidth).as("shingles"))
      .withColumn("sig",
        transform(sequence(lit(0), lit(k - 1)),
          i => array_min(transform(col("shingles"),
            s => md5(concat(s, lit("#"), i.cast("string")))))))
  }

  /** Candidate id pairs (a < b) sharing at least one LSH band. */
  def candidatePairs(sigs: DataFrame, bands: Int, r: Int): DataFrame = {
    val banded = sigs
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        md5(concat_ws("|", col("band").cast("string"),
          concat_ws("|", slice(col("sig"), col("band") * r + 1, lit(r))))).as("key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Full pipeline: verified near-dup pairs with exact Jaccard. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleWidth: Int = 3,
                   k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val sigs = signatures(docs, idCol, textCol, shingleWidth, k)
    val cands = candidatePairs(sigs, bands, k / bands)
    val sets = sigs.select(col("id"), col("shingles"))
    cands
      .join(sets.select(col("id").as("a"), col("shingles").as("sa")), "a")
      .join(sets.select(col("id").as("b"), col("shingles").as("sb")), "b")
      .withColumn("jac", TextFns.jaccard(col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }
}
