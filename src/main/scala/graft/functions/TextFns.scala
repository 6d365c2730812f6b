package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  *
  * Everything is a pure column expression (codegen'd by Catalyst, no
  * UDFs), and every hash is md5-based so the DuckDB oracle can compute
  * bit-identical values with its own `md5()`.
  */
object TextFns {

  /** Whitespace-collapsed, trimmed, lowercased text. */
  def norm(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of an already-normalized text. */
  def tokens(normed: Column): Column = split(normed, " ")

  /** Distinct word w-shingles ("a b c" strings); empty array for docs
    * shorter than w tokens (sequence() would flip direction otherwise).
    */
  def wordShingles(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      array_distinct(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w))))))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** Positional (non-distinct) word w-shingles, for winnowing. */
  def wordShinglesPositional(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** Distinct character n-grams of an already-normalized text.
    *
    * r15: linear, not quadratic — `substr(normed, i, n)` re-walks the
    * UTF8 string from position 0 on EVERY call (codepoint addressing),
    * so a transform over all positions was O(len^2) per document
    * (measured ~1.5 ms/doc at ~800 chars; the l4 gram stage alone ran
    * 7.7 s). The text is split into a codepoint array ONCE, bound via
    * a single-element transform (the only way to "let" a subexpression
    * inside a lambda — referencing it directly would re-evaluate the
    * split per element), and each gram is an O(n) slice+concat. */
  def charNgrams(normed: Column, n: Int): Column = {
    val grams = element_at(
      transform(array(split(normed, "")), cs =>
        transform(sequence(lit(1), length(normed) - (n - 1)),
          i => concat_ws("", slice(cs, i, lit(n))))), 1)
    when(length(normed) >= n, array_distinct(grams))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
  }

  /** Exact set Jaccard of two string arrays (both sides must be
    * distinct arrays). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Sorted distinct 60-bit md5 hashes of a distinct string array — the
    * compact verify-side representation of a gram set: 8 bytes/gram in
    * shuffles and checkpoints instead of the gram string, and set
    * operations become codegen'd merges ([[jaccardSorted]]) instead of
    * interpreted per-call hash sets. Requires
    * `graft.dialect.ChFunctions.register` on the session (md5Prefix60).
    * 60-bit collisions would alter a count; at any plausible per-pair
    * gram cardinality the probability is < 1e-12 and every declared
    * query is oracle-gated. */
  def sortedHashes(grams: Column): Column =
    array_sort(transform(grams, g => call_function("md5Prefix60", g)))

  /** Exact set Jaccard of two SORTED DISTINCT long-hash arrays
    * ([[sortedHashes]]): |a ∩ b| / (|a| + |b| - |a ∩ b|), the codegen
    * merge-intersect path. Identical values to [[jaccard]] over the
    * pre-hash string sets (absent 60-bit collisions — see above). */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = call_function("sortedLongIntersect", a, b)
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** How many tokens of `toks` appear in the wordlist (with
    * multiplicity) — the oracle side uses list_filter/list_contains. */
  def countIn(toks: Column, words: Seq[String]): Column = {
    val lst = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lst, t)))
  }
}
