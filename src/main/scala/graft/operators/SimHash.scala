package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** SimHash (Charikar) near-duplicate detection over 60-bit fingerprints.
  *
  * 60 bits (15 md5 hex chars) rather than 64 keeps every value inside a
  * signed BIGINT on both Spark and the DuckDB oracle — no unsigned
  * round-trip hazards.
  *
  * Candidate generation splits the fingerprint into `bands` equal bit
  * slices and bucket-joins on each slice. By pigeonhole this finds ALL
  * pairs with Hamming distance <= bands-1 (a pair differing in <= b-1
  * bits leaves at least one band untouched) — recall is exactly 1 for
  * the distance threshold, so the brute-force oracle matches
  * deterministically, unlike probabilistic MinHash banding.
  *
  * Scale: fingerprinting is shuffle-free; the bucket self-join is a
  * keyed equi-join (the only shuffle), and verification touches
  * candidates only.
  */
object SimHash {

  /** (id, sim) with sim = 60-bit simhash of the distinct word
    * w-shingle set. Bit j of md5(shingle) votes +1/-1; bit set iff the
    * vote sum is positive.
    *
    * Docs too short to produce a single shingle are EXCLUDED: with zero
    * votes every such doc would fingerprint to 0 and read as an exact
    * duplicate of every other short doc at hamming=0, regardless of
    * content. A sub-shingle doc has no SimHash signal — callers that
    * need them must handle short docs separately (e.g. exact dedup). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleWidth: Int = 3): DataFrame = {
    graft.dialect.ChFunctions.register(docs.sparkSession) // md5Prefix60
    val toks = TextFns.tokens(TextFns.norm(col(textCol)))
    // 2^j literals, so the final fold references `cnt` exactly ONCE —
    // chained withColumns collapse into one Project and Catalyst
    // INLINES aliases; an expression using cnt per-bit would re-expand
    // the whole vote fold 60x (measured 165s -> <1s on the fixture)
    val pow2 = (0 until 60).map(j => 1L << j).mkString("array(", "L,", "L)")
    docs.select(col(idCol).as("id"),
        TextFns.wordShingles(toks, shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), expr(
        s"""aggregate(
              zip_with(
                aggregate(
                  transform(sh, s -> md5Prefix60(s)),
                  transform(sequence(0, 59), j -> cast(0 AS BIGINT)),
                  (acc, h) -> zip_with(acc,
                    transform(sequence(0, 59),
                      j -> cast((shiftright(h, j) & 1) * 2 - 1 AS BIGINT)),
                    (a, b) -> a + b)),
                $pow2,
                (c, p) -> IF(c > 0, p, cast(0 AS BIGINT))),
              cast(0 AS BIGINT), (acc, x) -> acc + x)""").as("sim"))
  }

  /** Pairs (a, b, hamming) with Hamming distance <= maxDist. Requires
    * maxDist <= bands - 1 for guaranteed-complete candidate generation.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int, bands: Int = 6,
                   shingleWidth: Int = 3): DataFrame = {
    require(maxDist <= bands - 1, s"bands=$bands only guarantees dist<=${bands - 1}")
    require(60 % bands == 0, "bands must divide 60")
    val width = 60 / bands
    val mask = (1L << width) - 1
    val fps = fingerprints(docs, idCol, textCol, shingleWidth)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fps
      .select(col("id"), col("sim"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("key", expr(s"shiftright(sim, band * $width) & $mask"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sim").as("sa"), col("y.sim").as("sb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }
}
