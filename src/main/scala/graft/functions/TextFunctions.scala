package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines.
  *
  * Everything here is composed from codegen'd built-in functions (no UDFs),
  * so these stay inside whole-stage codegen and scale linearly with input —
  * no JVM↔interpreter hops at 100 TB.
  *
  * Cross-engine determinism: hashes derive from md5 (identical in every
  * engine) rather than Spark's murmur3 `hash()`, so results are verifiable
  * against any SQL oracle.
  */
object TextFunctions {

  /** Whitespace-normalized text: lowercase, collapse runs of whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Word tokens of normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** Token count (0 for empty/null-safe handled by caller). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token count. */
  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Word n-grams (arrays of space-joined n-word shingles); empty array when
    * the document has fewer than n tokens.
    *
    * Built by zipping n shifted views of the token array (`zip_with` pads
    * the short side with null; null grams are filtered off). This evaluates
    * the tokenizer O(n) times per ROW — the obvious
    * `transform(sequence, i => element_at(toks, i+j))` form re-evaluates the
    * whole lower+regexp+split chain per ELEMENT, which is O(tokens²) work
    * per document (measured 80× slower at sf0.1).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(
        acc,
        slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, g => g.isNotNull)
  }

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = normalized(text)
    val count = length(norm) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => substring(norm, i, lit(n))))
  }

  /** Deterministic 60-bit base hash of a string: first 15 hex chars of md5.
    * Engine-agnostic (md5 is standardized), unlike murmur3 `hash()`.
    */
  def stableHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Base hash reduced into the MinHash prime field. */
  val MinhashPrime = 1000000007L
  def fieldHash(s: Column): Column = pmod(stableHash60(s), lit(MinhashPrime))

  /** Content fingerprint of the normalized document (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Ratio of tokens belonging to `words` (e.g. stopword ratio). Integer
    * counts divided as doubles — bit-identical across engines.
    */
  def tokenRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(words: _*)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** Simple language-ID heuristic: score = stopword-profile hit ratio per
    * language; emit the best-scoring language or "unknown" when no profile
    * clears `minRatio`. Profiles are tiny top-stopword lists — the classic
    * cheap n-gram/stopword LID for corpus triage.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  def langId(text: Column, minRatio: Double = 0.02): Column = {
    val scored = LangProfiles.map { case (lang, words) => (lang, tokenRatio(text, words)) }
    // greatest-score argmax with deterministic first-wins tie-break
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 >= minRatio, best._1).otherwise(lit("unknown"))
  }
}
