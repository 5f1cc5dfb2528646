package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Reference-LM PERPLEXITY scoring — the CCNet-style curation step the
  * reference pipeline's quality gates imply at corpus scale (reference
  * `my_airflow/dags/mood_quality_check.py:10-41` gates on existence; a
  * training-corpus build gates on "does this document read like the
  * trusted slice"): train a bounded bigram language model on a trusted
  * subset, score every document by its average per-bigram negative
  * log-likelihood, and keep documents under a perplexity ceiling.
  *
  * All cross-engine-fragile arithmetic is integerized at the TERM level:
  * each bigram's NLL is snapped to integer MICRO-NATS
  * (`round(ln(r) × 1e6)` — a 1-ulp `ln` divergence between engines moves
  * the value by ~1e-9 of a micro-nat, nowhere near the 0.5 rounding
  * boundary), and everything downstream — the per-document sum, the
  * average, the keep cut — is 64-bit integer arithmetic, so the result
  * is bit-stable across engines, row orders, and partitionings.
  */
object LmScore {

  /** Bounded-bigram-LM perplexity filter.
    *
    * Model (trained on `docs.filter(trusted)` only):
    *  - unigram table: every trusted token with its occurrence count
    *    `c1` (vocabulary-bounded);
    *  - bigram table: the `topK` trusted bigrams by occurrence count
    *    (ties to the lexicographically smaller bigram — deterministic);
    *  - `V` = trusted vocabulary size (the add-one smoothing mass).
    *
    * Score: for each document bigram `w1 w2`, the smoothed conditional
    * `p(w2|w1) = (cnt + 1) / (c1 + V)` with `cnt` the model's count for
    * the bigram (0 when outside the top-K) and `c1` the unigram count of
    * `w1` (0 when `w1` is out-of-vocabulary) — so every term's NLL is
    * `ln((c1 + V) / (cnt + 1)) ≥ 0` (`cnt ≤ c1` whenever the bigram is
    * in the model, and `V ≥ 1`). Terms are snapped to micro-nats; a
    * document's `nll_micro` is their exact long sum.
    *
    * Keep rule (integer): `n_bigrams > 0 AND
    * nll_micro ≤ n_bigrams × keepMaxMicroNll` — i.e. average NLL at most
    * `keepMaxMicroNll / 1e6` nats/bigram (perplexity ≤ e^that). No
    * float epsilon can move the cut.
    *
    * Scale shape: both model tables collapse corpus-token-sized streams
    * at the VOCABULARY before their exchange (map-side partial
    * aggregation), the bigram table is additionally top-K
    * (TakeOrderedAndProject); scoring broadcasts both (vocabulary-
    * bounded — MBs at web scale; swap the unigram join to a shuffle join
    * if a tokenizer-free corpus ever exceeds broadcast) and the only
    * corpus-sized shuffle is the final doc-keyed sum. `V` rides as a
    * broadcast one-row frame (the q127 scalar discipline — no driver
    * round-trip in the plan).
    *
    * Output, one row per input document (bigram-less docs score NULL avg
    * and keep = false): `(idCol, n_bigrams, nll_micro, avg_nll_micro,
    * keep)`.
    */
  def bigramPerplexity(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      trusted: Column,
      topK: Int,
      keepMaxMicroNll: Long): DataFrame = {
    require(keepMaxMicroNll > 0,
      "bigramPerplexity: keepMaxMicroNll must be positive")
    val model = trainBigramLm(docs.filter(trusted), textCol, topK)
    val scored = scoreBigrams(docs, textCol, idCol, model)
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        when(col("n_bigrams") > 0,
          expr("nll_micro div n_bigrams")).as("avg_nll_micro"),
        coalesce(col("n_bigrams") > 0 &&
          col("nll_micro") <= col("n_bigrams") * keepMaxMicroNll,
          lit(false)).as("keep"))
  }

  /** The frozen model [[trainBigramLm]] produces and [[scoreBigrams]]
    * consumes: unigram counts (vocabulary-bounded), the top-K bigram
    * table, and the smoothing mass V as a broadcast one-row frame.
    * Compute once, score many (batches, streams — the baselinePpm
    * discipline).
    */
  final case class BigramLm(uni: DataFrame, lm: DataFrame, vRow: DataFrame)

  /** Train the bounded bigram LM on `trusted` (see [[bigramPerplexity]]
    * for the smoothing/boundedness contract).
    */
  def trainBigramLm(
      trusted: DataFrame,
      textCol: String,
      topK: Int): BigramLm = {
    require(topK > 0, "trainBigramLm: topK must be positive")
    val uni = trusted
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val lm = trusted
      .select(explode(TextFunctions.wordNgrams(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg")).limit(topK)
    BigramLm(uni, lm, uni.agg(count(lit(1)).as("__V")))
  }

  /** Per-document (n_bigrams, nll_micro) under `model` — inner rows
    * only (a bigram-less document emits nothing; callers decide its
    * fate). One broadcast-probed map pass + one doc-keyed sum.
    */
  def scoreBigrams(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      model: BigramLm): DataFrame =
    docs
      .select(col(idCol),
        explode(TextFunctions.wordNgrams(col(textCol), 2)).as("bg"))
      .withColumn("__w1", element_at(split(col("bg"), " "), 1))
      .join(broadcast(model.lm), Seq("bg"), "left")
      .join(broadcast(model.uni.withColumnRenamed("tok", "__w1")),
        Seq("__w1"), "left")
      .crossJoin(broadcast(model.vRow))
      // integer micro-nats: ln of a ratio of exact-integer-valued doubles,
      // scaled and snapped BEFORE any accumulation (see object scaladoc)
      .select(col(idCol),
        round(log((coalesce(col("c1"), lit(0L)) + col("__V")).cast("double") /
          (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double")) * 1e6, 0)
          .cast("long").as("__nll_u"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll_u")).as("nll_micro"))
}
