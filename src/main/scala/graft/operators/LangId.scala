package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based language identification — the fastText serving shape
  * (hashed character-n-gram features into a linear per-language logit)
  * upgrading the q17 stopword-profile heuristic, with the q87
  * frozen-model discipline: the weights here are a deterministic
  * stand-in (`w10(bucket, lang) = (bucket·P_lang + Q_lang) mod 21 − 10`,
  * a fixed formula both engines evaluate identically) because the POINT
  * is the serving plumbing a learned model needs — feature hashing
  * (stable 60-bit hash of each char trigram into a fixed-width bucket
  * space, vocabulary-independent), EXACT INTEGER logits (each gram
  * contributes its bucket's ×10 integer weight per language; long sums
  * are order-independent, so scores are bit-stable across engines,
  * partitionings, and re-runs), and a deterministic argmax
  * (first-language-wins tie-break over the fixed [[Langs]] order).
  *
  * Scale shape: ONE char-trigram explode collapsed by map-side partial
  * aggregation into |Langs| integer sums per doc — a single doc-keyed
  * shuffle carrying K longs per doc, exactly the q87 plan; the argmax
  * is scan-side array math. No per-language passes, no UDF, no model
  * broadcast (the "weights" are arithmetic).
  *
  * One row per input document: a doc too short for a single trigram
  * (or null text) emits (0, 'unknown', NULL, NULL).
  */
object LangId {

  /** The frozen label space, argmax tie-break order. */
  val Langs: Seq[String] =
    Seq("en", "de", "es", "fr", "it", "pt", "nl", "zh")
  val Buckets = 64

  /** Per-language affine constants of the stand-in weight formula. */
  private val P = Seq(37, 41, 43, 47, 53, 59, 61, 67)
  private val Q = Seq(5, 11, 17, 2, 8, 19, 3, 13)

  /** Character n-grams of the normalized text (empty array when the
    * text is shorter than `n` — Spark's `sequence(1, x)` counts DOWN
    * for x < 1, so the guard is load-bearing).
    */
  def charNgrams(text: Column, n: Int): Column = {
    val m = TextFunctions.normalized(coalesce(text, lit("")))
    when(length(m) >= n,
      transform(sequence(lit(1), length(m) - (n - 1)),
        i => m.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Score every document: (`idCol`, n_grams, lang_pred, z_best,
    * margin) — `z_best` the winning exact-integer logit, `margin` its
    * lead over the runner-up (0 on a tie; the serving-side confidence
    * signal a router thresholds on).
    */
  def scoreDocs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "scoreDocs: n must be >= 1")
    val bucket = pmod(TextFunctions.stableHash60(col("g")), lit(Buckets))
    val zAggs = Langs.indices.map { k =>
      sum(pmod(col("bk") * P(k) + Q(k), lit(21)) - 10).as(s"z$k")
    }
    val agg = docs
      .select(col(idCol), explode(charNgrams(col(textCol), n)).as("g"))
      .select(col(idCol), bucket.as("bk"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), zAggs: _*)
    val zArr = array(Langs.indices.map(k => col(s"z$k")): _*)
    val negSorted = array_sort(transform(zArr, z => -z))
    val best = -element_at(negSorted, 1)
    val margin = element_at(negSorted, 2) - element_at(negSorted, 1)
    val pred = Langs.zipWithIndex.tail.foldLeft(
      when(col("z0") === best, Langs.head)) { case (acc, (l, k)) =>
      acc.when(col(s"z$k") === best, l)
    }
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(when(col("n_grams") > 0, pred), lit("unknown"))
          .as("lang_pred"),
        when(col("n_grams") > 0, best).as("z_best"),
        when(col("n_grams") > 0, margin).as("margin"))
  }
}
