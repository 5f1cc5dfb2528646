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
  * Scale shape: MAP-ONLY. The
  * [[org.apache.spark.sql.graft.CharNgramBucketCounts]] kernel folds a
  * document's whole trigram histogram into one scan-side evaluation
  * (one md5 per gram straight off the backing bytes, no per-gram
  * string, no Generate), and the per-language logits are 64-element
  * dot products against literal weight tables — z_k = Σ_b count_b ·
  * w10(b, k), identical by distributivity to the per-gram sum. No
  * explode, no join, no shuffle before the caller's sink; the
  * explode→aggregate form is kept as [[scoreDocsViaExplode]] for the
  * cross-check spec.
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

  /** Score every document: (`idCol`, [carry...], n_grams, lang_pred,
    * z_best, margin) — `z_best` the winning exact-integer logit,
    * `margin` its lead over the runner-up (0 on a tie; the serving-side
    * confidence signal a router thresholds on). Map-only: one
    * [[org.apache.spark.sql.graft.CharNgramBucketCounts]] histogram per
    * document, then literal-table dot products for the logits.
    *
    * @param carry extra source-row columns kept on the output — the
    *   map-only-carry discipline (joining scores back onto the source
    *   frame costs an exchange pair the projection never needed).
    */
  def scoreDocs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      carry: Seq[String] = Nil): DataFrame = {
    require(n >= 1, "scoreDocs: n must be >= 1")
    import org.apache.spark.sql.graft.{CharNgramBucketCounts, ColumnBridge}
    val m = TextFunctions.normalized(coalesce(col(textCol), lit("")))
    val cnts = ColumnBridge.column(
      CharNgramBucketCounts(ColumnBridge.expression(m), n, Buckets))
    // frozen per-language weight tables, one 64-long literal each:
    // w10(b, k) = (b·P_k + Q_k) mod 21 − 10, evaluated at plan build
    val wTabs: Seq[Array[Long]] = Langs.indices.map(k =>
      (0 until Buckets).map(b => ((b * P(k) + Q(k)) % 21 - 10).toLong)
        .toArray)
    val zArr = array(wTabs.map(w =>
      aggregate(zip_with(col("__c"), lit(w), (c, wt) => c * wt),
        lit(0L), (a, x) => a + x)): _*)
    val negSorted = array_sort(transform(col("__z"), z => -z))
    val best = -element_at(negSorted, 1)
    val margin = element_at(negSorted, 2) - element_at(negSorted, 1)
    val pred = Langs.zipWithIndex.tail.foldLeft(
      when(element_at(col("__z"), 1) === best, Langs.head)) {
      case (acc, (l, k)) =>
        acc.when(element_at(col("__z"), k + 1) === best, l)
    }
    val keep = carry.map(col)
    docs
      .select(col(idCol) +: keep :+ cnts.as("__c"): _*)
      .select((col(idCol) +: keep) ++ Seq(
        aggregate(col("__c"), lit(0L), (a, c) => a + c).as("n_grams"),
        zArr.as("__z")): _*)
      .select((col(idCol) +: keep) ++ Seq(
        col("n_grams"),
        when(col("n_grams") > 0, pred).otherwise("unknown").as("lang_pred"),
        when(col("n_grams") > 0, best).as("z_best"),
        when(col("n_grams") > 0, margin).as("margin")): _*)
  }

  /** The declarative explode→aggregate form — cross-check reference for
    * the kernel path ([[scoreDocs]] must match it bit-for-bit; see
    * LangIdSpec). One char-trigram explode collapsed by map-side
    * partial aggregation into |Langs| sums per doc, then a left join
    * restoring gram-free documents.
    */
  private[graft] def scoreDocsViaExplode(
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
