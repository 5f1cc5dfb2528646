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

  /** Word tokens of normalized text. Single regex pass: splitting the
    * trimmed lowercase directly on \s+ yields token arrays identical to
    * collapse-whitespace-then-split-on-space, at half the regex cost (the
    * tokenizer dominates every text operator's profile).
    */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Token count (0 for empty/null-safe handled by caller). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: matches of a GPT-2-style pre-tokenizer
    * pattern (contraction suffixes, space-prefixed letter runs, digit
    * runs, punctuation runs) over normalized text — the cheap proxy for
    * "how many tokens will the real tokenizer emit" used to budget
    * sequence packing without shipping a tokenizer to executors. The
    * pattern avoids lookarounds so Java regex (Spark) and RE2 (other
    * engines) agree on every match.
    */
  val BpePattern = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"
  def bpeTokenCount(text: Column): Column =
    regexp_count(normalized(text), lit(BpePattern))

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
  def wordNgrams(text: Column, n: Int): Column =
    ngramsOfTokens(tokens(text), n)

  /** Word n-grams from an ALREADY-bound token-array column (bind [[tokens]]
    * to a real attribute first when the same array feeds several n-gram
    * widths — otherwise each width re-runs the tokenizer regex).
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(
        acc,
        slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, g => g.isNotNull)
  }

  /** Count of the most frequent element in a string array (null array →
    * null, empty → 0). Computed as the longest equal-run of the SORTED
    * array — one `array_sort` + one linear `aggregate` fold per row, all
    * codegen'd built-ins. The obvious per-distinct-element
    * `size(filter(arr, _ === e))` scan is O(n²) per document and melts on
    * the long tail at corpus scale; this form is O(n log n) and map-only
    * (no explode, no shuffle), which is what a 100 TB quality pass needs.
    */
  def maxElementCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(
        lit(null).cast("string").as("prev"),
        lit(0).as("run"),
        lit(0).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(
          x.as("prev"),
          run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfNorm(normalized(text), n)

  /** k-char shingles of an ALREADY-normalized text column. Prefer binding
    * [[normalized]] to a real attribute first and calling this: Catalyst
    * re-evaluates non-lambda subexpressions inside a lambda per ELEMENT,
    * so the inline form above re-runs the normalization regex once per
    * shingle — O(n²) chars/doc on long documents.
    */
  def charShinglesOfNorm(norm: Column, n: Int): Column = {
    val count = length(norm) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => substring(norm, i, lit(n))))
  }

  /** Deterministic 60-bit base hash of a string: first 15 hex chars of md5.
    * Engine-agnostic (md5 is standardized), unlike murmur3 `hash()`.
    * Computed by the codegen'd [[org.apache.spark.sql.graft.StableHash60]]
    * expression — bit-identical to the declarative
    * `conv(substring(md5(s), 1, 15), 16, 10)` form (kept below for
    * cross-checking) without the per-evaluation hex-string round-trip,
    * which this hash pays per SHINGLE in the dedup/fingerprint hot paths.
    */
  def stableHash60(s: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.graft.StableHash60(ColumnBridge.expression(s)))
  }

  /** Reference declarative implementation (cross-check only). */
  private[graft] def stableHash60Reference(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Base hash reduced into the MinHash prime field. */
  val MinhashPrime = 1000000007L
  def fieldHash(s: Column): Column = pmod(stableHash60(s), lit(MinhashPrime))

  /** Content fingerprint of the normalized document (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Per-document k-char shingle hash array — stage 1 of winnowing.
    * MUST be materialized as its own projection (`.select(...)`) before
    * being fed to [[winnowSelect]]: a Catalyst lambda re-evaluates every
    * non-lambda subexpression per element, so inlining this inside the
    * window pass re-runs the whole md5 shingle scan once per window —
    * O(n²)/doc (measured: sf0.01 blew the 600 s verify watchdog; the
    * two-projection form runs in seconds — same class as the q19
    * tokenizer lesson in BASELINE.md). CollapseProject keeps the split:
    * the alias is referenced more than once downstream, so the optimizer
    * will not re-inline it.
    */
  def shingleHashes(text: Column, k: Int = 7): Column =
    transform(charShingles(text, k), sh => fieldHash(sh))

  /** [[shingleHashes]] over a pre-bound normalized column (see
    * [[charShinglesOfNorm]] for why the caller should materialize it).
    */
  def shingleHashesOfNorm(norm: Column, k: Int = 7): Column =
    transform(charShinglesOfNorm(norm, k), sh => fieldHash(sh))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    * scheme) — stage 2: select the minimum hash of each w-length sliding
    * window over a MATERIALIZED [[shingleHashes]] column; the sorted
    * distinct selected hashes are the document's robust content signature
    * (guaranteed to share fingerprints with any document overlapping by
    * ≥ w+k-1 chars). O(n·w) codegen'd map-side work, no UDF, no shuffle —
    * at 100 TB this is a scan-side projection.
    */
  def winnowSelect(hashes: Column, w: Int = 4): Column = {
    val nWin = size(hashes) - (w - 1)
    val mins = when(size(hashes) === 0, array().cast("array<long>"))
      .when(nWin <= 0, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(1), nWin),
        i => array_min(slice(hashes, i, lit(w)))))
    array_sort(array_distinct(mins))
  }

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

  /** PII redaction patterns, ordered: URLs first (an email-shaped
    * userinfo inside a URL must be swallowed by the URL rule, not split
    * by the email rule), then emails, then phone-ish digit runs (≥ 8
    * digit/sep chars bounded by digits — long enough to spare ordinary
    * small numbers). Restricted to the Java-regex ∩ RE2 common subset
    * (no lookaround, no backrefs) so any engine — and the SQL oracle —
    * can evaluate the same patterns verbatim.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "https?://[^ \\t\\n]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "[0-9][0-9 ()+.-]{6,}[0-9]" -> "<NUM>")

  /** Redact URLs/emails/phone-like digit runs to typed placeholder
    * tokens. Pure scan-side projection (three codegen'd regex passes,
    * no shuffle) — at 100 TB this rides the ingest scan for free.
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Count of matches of each PII class, same patterns as [[scrubPii]]. */
  def piiCounts(text: Column): Seq[Column] =
    PiiPatterns.map { case (p, _) => regexp_count(text, lit(p)) }

  /** 1-based character offsets of overlapping chunk windows over
    * `text`: 1, 1+stride, 1+2·stride, … while ≤ max(len, 1) — every
    * doc gets at least one chunk (an empty text yields one empty
    * chunk), and each chunk is `substr(text, start, chunkLen)`
    * (the final one may run short). Pure scan-side arithmetic — the
    * chunk explode is the context-window prep step of a training/RAG
    * pipeline, and it rides the ingest scan with no shuffle; chunk
    * index recovers as (start − 1) / stride, so the expression stays
    * shared with the SQL oracle instead of needing posexplode.
    */
  def chunkStarts(text: Column, chunkLen: Int, overlap: Int): Column = {
    require(chunkLen > 0 && overlap >= 0 && overlap < chunkLen,
      "need chunkLen > overlap >= 0")
    sequence(lit(1),
      greatest(coalesce(length(text), lit(0)), lit(1)),
      lit(chunkLen - overlap))
  }

  def langId(text: Column, minRatio: Double = 0.02): Column = {
    val toks = tokens(text)
    val langs = LangProfiles.map(_._1)
    // ONE pass over ONE tokenization, accumulating every profile's hit
    // count plus the total token count (last slot) — a per-language
    // tokenRatio + pairwise-max fold duplicates each score expression at
    // every fold step (2^langs copies of the early ratios; measured
    // 9.5 s → 1 s at sf0.1), and HOF lambdas block codegen CSE, so each
    // extra reference to `toks` re-runs the tokenizer
    val counts = aggregate(
      toks,
      typedLit(Seq.fill(langs.length + 1)(0)),
      (acc, t) => zip_with(acc,
        array(LangProfiles.map { case (_, ws) =>
          when(t.isin(ws: _*), 1).otherwise(0)
        } :+ lit(1): _*),
        (a, b) => a + b))
    val hits = slice(counts, 1, langs.length)
    // argmax with deterministic first-wins tie-break: sort (-hits, idx) asc
    val ranked = array_sort(zip_with(hits,
      sequence(lit(0), lit(langs.length - 1)),
      (h, i) => struct((-h).as("nh"), i.as("i"))))
    val best = element_at(ranked, 1)
    // same count ⇒ same ratio: argmax over hit counts = argmax over ratios
    val bestRatio = (-best.getField("nh")).cast("double") /
      element_at(counts, langs.length + 1).cast("double")
    val bestLang = element_at(typedLit(langs), best.getField("i") + 1)
    when(bestRatio >= minRatio, bestLang).otherwise(lit("unknown"))
  }
}
