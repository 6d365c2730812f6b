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
    // r15: the old single-projection form folded the 60 vote counters
    // with nested aggregate/zip_with lambdas — higher-order functions
    // run INTERPRETED (two boxed 60-element arrays per shingle; same
    // hazard the MinHash fold had). Same math, codegen shape: explode
    // the shingle set, hash once, take 60 primitive-long sum()
    // aggregates (vote_j = 2*bit_j - 1), then assemble the fingerprint
    // with a 60-term conditional add in one projection — whole-stage
    // codegen end to end, partial aggs collapse per partition before
    // the (tiny) shuffle.
    // spread first: a single-file corpus scans as ONE task (guide §2.5);
    // narrowed to (id, text) so the spread checkpoint materializes only
    // the columns this operator reads (r16, guide §2.3)
    val votes = graft.Tables.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        TextFns.wordShingles(toks, shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), expr("md5Prefix60(s)").as("h"))
    val voteCols = (0 until 60).map(j =>
      sum(expr(s"(shiftright(h, $j) & 1) * 2 - 1")).as(s"__c$j"))
    val simExpr = (0 until 60)
      .map(j => s"IF(__c$j > 0, ${1L << j}L, 0L)").mkString(" + ")
    votes.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), expr(simExpr).as("sim"))
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
    // localCheckpoint, not persist: a leaked cache entry would serve
    // later identical plans from memory (see MinHashLsh.nearDupPairs)
    val fps = fingerprints(docs, idCol, textCol, shingleWidth)
      .localCheckpoint(true)
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
