package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Blocklist word gate — the C4 "bad words" stage (Raffel et al. 2020
  * drop any page containing a listed word; RefinedWeb and FineWeb keep
  * the same shape with tuned lists): documents are scored by
  * whole-token blocklist hits over normalized text and dropped on any
  * hit. The list is a policy input, not a constant — pass the
  * deployment's list; the gate only fixes the MATCHING semantics
  * (exact lowercase token equality — no substring matches, so
  * "class" never hits "ass"; phrase entries are out of scope by
  * contract).
  *
  * Scale shape: MAP-ONLY — the list compiles into the filter lambda as
  * an `InSet` literal probe (the q152 discipline), so a 100 TB corpus
  * pays one tokenizer pass and zero shuffle, and the list never ships
  * as a join side.
  */
object Wordfilter {

  /** Per-document report: (`idCol`, n_tokens, hits [with multiplicity],
    * hit_pp10k [floor, NULL for tokenless docs], keep = hits == 0).
    */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "Wordfilter.score: empty blocklist")
    require(words.forall(w => w.nonEmpty && w == w.toLowerCase &&
      !w.exists(_.isWhitespace)),
      "Wordfilter.score: blocklist entries must be lowercase single tokens")
    // NULL text coalesces to '' (the Entropy/Mojibake discipline):
    // a NULL-text doc is (0, 0, NULL density, keep) — never NULL
    // counts or a NULL verdict
    val toks = filter(
      TextFunctions.tokens(coalesce(col(textCol), lit(""))),
      t => t =!= "")
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => t.isInCollection(words))).cast("long")
        .as("hits"))
      .withColumn("hit_pp10k",
        when(col("n_tokens") > 0,
          expr("(hits * 10000) div n_tokens")))
      .withColumn("keep", col("hits") === 0)
  }
}
