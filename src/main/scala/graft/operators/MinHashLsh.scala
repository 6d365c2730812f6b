package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFns

/** MinHash + LSH banding near-duplicate detection.
  *
  * Shape (reference treats dedup as out-of-scope/delegated; this is the
  * standard Broder MinHash construction, built Spark-first):
  *
  *   1. per doc: distinct word w-shingles                      (no shuffle)
  *   2. per doc: ONE md5 per shingle -> 31-bit base hash, then k
  *      affine permutations h_i = (a_i*h + b_i) mod p, folded into
  *      an element-wise-min signature                           (no shuffle)
  *   3. band keys: r consecutive signature slots; explode to
  *      (band, key, id)                   (1 shuffle: self-join on band key)
  *   4. candidate pairs = same (band, key), a < b, distinct
  *   5. verify with EXACT shingle-set Jaccard >= threshold
  *
  * The affine re-hash (vs k independent md5s) matters: signatures cost
  * one digest per shingle, everything else is integer arithmetic. The
  * exact-verify step means internal hash choices never affect results,
  * so the DuckDB oracle is plain brute-force Jaccard — no hash parity
  * needed (unlike SimHash, whose fingerprints ARE the output).
  *
  * The signature frame is persisted because banding uses it twice
  * (self-join) and verification twice more; at 100 TB persist only
  * (id, sig) and re-derive shingles for the (rare) candidate pairs.
  *
  * Recall: a pair at Jaccard j survives banding with
  * p = 1-(1-j^r)^bands; at j=0.95, r=4, bands=16 => 1 - 2e-13.
  */
object MinHashLsh {

  private val P = 2147483647L // 2^31 - 1: a_i*h + b_i stays < 2^62

  /** One (id, hs, sig) row per distinct id, eagerly localCheckpoint'ed;
    * `hs` is the SORTED array of distinct 60-bit md5 shingle hashes
    * (8 bytes/shingle in checkpoint and verify shuffles instead of the
    * shingle string; exact-verify runs the codegen'd
    * sortedLongIntersect merge, r16) and sig is array<bigint>(k).
    *
    * ID CONTRACT: ids are expected unique (every caller feeds a
    * primary-key doc_id). Since the aggregate groups by id with no
    * join-back (r16), duplicate ids degrade DETERMINISTICALLY — their
    * shingle sets merge into one row whose signature/hs is that of the
    * union document — rather than cross-producting rows (the r15
    * join-back shape's failure mode flagged in ADVICE).
    *
    * Docs too short to produce one shingle are EXCLUDED: their fold
    * would return the init sentinel [P,P,..], colliding every short doc
    * into every band (O(n^2) candidate pairs that exact-verify then
    * drops anyway — Jaccard of empty sets is null). Short docs simply
    * have no MinHash signal; dedupAssignments keeps them all (no
    * signature -> never a pair -> each is its own representative). */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleWidth: Int = 3, k: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(20260812L)
    val a = Seq.fill(k)(1L + rnd.nextLong().abs % (P - 1))
    val b = Seq.fill(k)(rnd.nextLong().abs % P)
    graft.dialect.ChFunctions.register(docs.sparkSession) // md5Prefix60
    val toks = TextFns.tokens(TextFns.norm(col(textCol)))
    // r15: the old single-projection form folded the k-way min with
    // nested aggregate/zip_with lambdas — higher-order functions run
    // INTERPRETED (two boxed 64-element arrays allocated per shingle;
    // measured ~9.5 s/run on the sf0.1 corpus once the cache-leak that
    // had been hiding the cost was fixed). Same math, codegen shape:
    // explode the shingle set, hash each shingle once, and take k
    // primitive-long min() aggregates — whole-stage codegen end to
    // end, with the map-side partial agg collapsing each partition to
    // one 64-long row per doc before the (tiny) shuffle.
    //
    // r16: ONE aggregation builds BOTH the signature and the verify
    // set. The exploded shingle stream hashes each shingle once with
    // the codegen'd md5Prefix60 (never an interpreted transform() over
    // the array — HOF lambdas run interpreted, the r15 lesson), and
    // the groupBy(id) computes the k min() slots AND
    // sort_array(collect_set(h0)) — the doc's sorted distinct 60-bit
    // hash set — in the same pass. That removes the r15 shape's
    // base-side checkpoint of shingle STRINGS and the base⋈mins join
    // entirely: signatures() returns the single aggregated frame,
    // eagerly checkpointed here (from parquet, inside the run; every
    // caller reuses it without re-checkpointing). Verify joins ship
    // 8 bytes/shingle and run the codegen'd sortedLongIntersect merge.
    // Docs too short for one shingle vanish from the explode, which is
    // exactly the old filter(size > 0) exclusion.
    // spread first: a single-file corpus scans as ONE task, serializing
    // the whole shingle pipeline (guide §2.5; no-op for multi-file input)
    // narrow BEFORE spread: the eager spread checkpoint otherwise
    // materializes every column of the corpus; only (id, text) feed
    // this operator (guide §2.3 "project before the exchange")
    val hs = graft.Tables.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        explode(TextFns.wordShingles(toks, shingleWidth)).as("s"))
      .select(col("id"), expr("md5Prefix60(s)").as("h0"))
      .select(col("id"), col("h0"), expr(s"h0 % $P").as("h"))
    val minCols = (0 until k).map(i =>
      min(expr(s"(${a(i)}L * h + ${b(i)}L) % $P")).as(s"__m$i"))
    val aggCols = sort_array(collect_set(col("h0"))).as("hs") +: minCols
    hs.groupBy(col("id")).agg(aggCols.head, aggCols.tail: _*)
      .select(col("id"), col("hs"),
        array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
      .localCheckpoint(true)
  }

  /** LSH band index: (id, band, key) — one row per document per band,
    * the key being the r-slot signature slice. For a standing corpus
    * this is the artifact to persist (parquet, bucketed by (band, key)):
    * incremental batches then probe it with a keyed join and never touch
    * corpus text again. */
  def bandKeys(sigs: DataFrame, bands: Int, r: Int): DataFrame =
    sigs
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        slice(col("sig"), col("band") * r + 1, lit(r)).as("key"))

  /** Candidate id pairs (a < b) sharing at least one LSH band. The key
    * is the r-slot signature slice itself (array equi-join). */
  def candidatePairs(sigs: DataFrame, bands: Int, r: Int): DataFrame = {
    val banded = bandKeys(sigs, bands, r)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Dedup decision per document: connected components over the
    * near-dup pair graph, each cluster represented by its minimum id;
    * a doc is kept iff it IS its cluster's representative.
    *
    * Each round does (1) one-hop min-propagation — label = min(label of
    * self + neighbors) — and (2) pointer jumping (path halving):
    * rep := rep(rep), a self-join of the label frame. Propagation alone
    * needs diameter-many rounds; the jump step roughly doubles covered
    * distance per round, so rounds are logarithmic in component
    * diameter. The loop runs to an exact FIXPOINT (stop when no label
    * changes), so long chains of templated near-dups — arbitrarily deep
    * at corpus scale — still collapse to one representative. Every step
    * is a keyed join against the (small) pair list; no all-pairs work.
    * Label frames are localCheckpoint'ed each round to truncate the
    * iterative lineage (on a real cluster use reliable checkpoint).
    */
  def dedupAssignments(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, maxRounds: Int = 25): DataFrame = {
    val pairs = nearDupPairs(docs, idCol, textCol, threshold)
      .select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // undirected edges, both directions
    val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = docs.select(col(idCol).as("id"))
      .withColumn("rep", col("id"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      // (1) one-hop min-propagation along edges
      val viaNeighbors = edges
        .join(labels.select(col("id").as("b"), col("rep").as("nrep")), "b")
        .groupBy(col("a")).agg(min(col("nrep")).as("minNrep"))
      val propagated = labels
        .join(viaNeighbors.select(col("a").as("id"), col("minNrep")),
          Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("minNrep"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      // (2) pointer jumping: rep := rep(rep)
      val next = propagated
        .join(propagated.select(col("id").as("rep"), col("rep").as("rep2")),
          Seq("rep"), "left")
        .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.rep") =!= col("o.rep"))
        .isEmpty
      labels = next
    }
    // labels is localCheckpoint-materialized — the pair/edge frames are
    // done; release their cache blocks instead of leaking them across
    // calls in a long-lived session
    pairs.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    labels.select(col("id"), col("rep"),
      (col("id") === col("rep")).as("is_kept"))
  }

  /** Incremental dedup — classify an INCOMING batch against an EXISTING
    * corpus without re-pairing the corpus with itself (the production
    * shape at 100 TB: today's crawl probes yesterday's index; history is
    * never re-shingled). Per incoming doc: `is_dup` (some existing doc
    * has exact shingle-Jaccard >= threshold), `dup_of` (the minimum such
    * existing id, null when novel) and `jac` (the Jaccard against
    * `dup_of`).
    *
    * Cost model: the existing side contributes only its band index
    * (`bandKeys` — write-once, reusable across batches; bucket it by
    * (band, key) and the probe is shuffle-free on the corpus side) plus
    * a keyed shingle re-fetch for verified candidates. Nothing scales
    * with |existing|×|existing| or |existing|×|incoming|; only matched
    * band buckets are touched. Both sides hash with the same seeded
    * permutations, so an index built in an earlier run stays joinable.
    */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
                       idCol: String, textCol: String, threshold: Double,
                       shingleWidth: Int = 3, k: Int = 64,
                       bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // signatures() already returns an eagerly checkpointed frame (r16)
    val exSigs = signatures(existing, idCol, textCol, shingleWidth, k)
    val inSigs = signatures(incoming, idCol, textCol, shingleWidth, k)
    // candidate (incoming a, existing b) pairs sharing a band bucket
    val cands = bandKeys(inSigs, bands, r).as("x")
      .join(bandKeys(exSigs, bands, r).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // exact-verify candidates only (keyed shingle-hash re-fetch, both
    // sides; codegen'd merge-intersect — see signatures)
    val verified = cands
      .join(inSigs.select(col("id").as("a"), col("hs").as("sa")), "a")
      .join(exSigs.select(col("id").as("b"), col("hs").as("sb")), "b")
      .withColumn("jac", TextFns.jaccardSorted(col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
    // min-id match per incoming doc, carrying that match's Jaccard
    val best = verified.groupBy(col("a"))
      .agg(min(struct(col("b"), col("jac"))).as("m"))
      .select(col("a").as("id"), col("m.b").as("dup_of"),
        round(col("m.jac"), 4).as("jac"))
    incoming.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("jac"))
  }

  /** Full pipeline: verified near-dup pairs with exact Jaccard. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleWidth: Int = 3,
                   k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // sigs is reused by the band join and both verify joins;
    // signatures() returns it already eagerly localCheckpoint'ed —
    // NEVER bare-persisted: a persist here is never unpersisted and
    // Spark's CacheManager would serve any LATER identical plan from
    // the stale entry (the banned cross-run caching class, r15; same
    // discipline in incrementalDedup / SimHash / SimilarityJoin /
    // CosineKnn).
    val sigs = signatures(docs, idCol, textCol, shingleWidth, k)
    val cands = candidatePairs(sigs, bands, k / bands)
    val sets = sigs.select(col("id"), col("hs"))
    cands
      .join(sets.select(col("id").as("a"), col("hs").as("sa")), "a")
      .join(sets.select(col("id").as("b"), col("hs").as("sb")), "b")
      .withColumn("jac", TextFns.jaccardSorted(col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }
}
