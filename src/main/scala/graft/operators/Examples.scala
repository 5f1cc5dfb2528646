package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-EXAMPLE construction — the step between a curated corpus
  * and the objective: rewrite each document into (input, target) pairs
  * for a denoising objective. Everything is a pure function of
  * (document id, position, salt): no RNG, so a re-run, a retried task,
  * or another engine reproduces every example bit-for-bit — the same
  * auditability contract as the engine's deterministic samplers.
  */
object Examples {

  /** T5-style SPAN CORRUPTION: each token position is flagged by a
    * stable hash at `maskPerCent`%, maximal runs of flagged positions
    * become masked spans, span k is replaced by the sentinel
    * `<extra_id_k>` in the INPUT, and the TARGET lists each sentinel
    * followed by the tokens it hid — the standard denoising pair.
    * Flags are per-position hashes (`hash(doc:pos:salt) mod 100`), so
    * consecutive flagged positions merging into one span reproduces
    * T5's expected-span-length>1 behavior without any RNG state.
    *
    * Scale shape: one tokenizer pass (posexplode), ONE doc-keyed
    * window (lag + running span count over positions — per-document
    * data, inherent to span structure), one doc-keyed re-assembly
    * aggregation (the [[Vocab.encode]] position-sorted discipline).
    * Nothing corpus-global: every shuffle key is the document id.
    *
    * Output: (`idCol`, n_tokens, n_masked, n_spans, input_text,
    * target_text) — ONE ROW PER INPUT DOCUMENT: an unmasked document
    * keeps its full text as input and an empty target, and a
    * zero-token document (empty/whitespace/null text) emits
    * (0, 0, 0, "", "") rather than silently dropping. The outer
    * explode carries such docs through on a null-position row that the
    * window functions and every aggregate ignore.
    */
  def spanCorrupt(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maskPerCent: Int,
      salt: String): DataFrame = {
    require(maskPerCent >= 0 && maskPerCent <= 100,
      "spanCorrupt: maskPerCent must be in [0, 100]")
    val toks = docs.select(col(idCol),
      posexplode_outer(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos0", "tok")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("tok"))
    val flagged = pmod(TextFunctions.stableHash60(
      concat(col(idCol).cast("string"), lit(":"),
        col("pos").cast("string"), lit(s":$salt"))), lit(100L)) < maskPerCent
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val marked = toks
      .withColumn("__f", flagged)
      .withColumn("__start",
        col("__f") && !coalesce(lag(col("__f"), 1).over(byPos), lit(false)))
      // span index k (0-based) for every flagged position: the number of
      // span STARTS at or before it, minus one
      .withColumn("__k",
        sum(when(col("__start"), 1L).otherwise(0L)).over(
          byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    val sentinel = concat(lit("<extra_id_"), col("__k").cast("string"), lit(">"))
    val pieces = marked.select(col(idCol), col("pos"), col("__f"),
      col("__start"),
      when(!col("__f"), col("tok"))
        .when(col("__start"), sentinel).as("__in"),
      when(col("__start"), concat(sentinel, lit(" "), col("tok")))
        .when(col("__f"), col("tok")).as("__tgt"))
    def joined(piece: String) = array_join(transform(
      filter(array_sort(collect_list(struct(col("pos"), col(piece).as("p")))),
        s => s.getField("p").isNotNull),
      s => s.getField("p")), " ")
    pieces.groupBy(col(idCol))
      .agg(count(col("pos")).as("n_tokens"),
        sum(when(col("__f"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("__start"), 1L).otherwise(0L)).as("n_spans"),
        joined("__in").as("input_text"),
        joined("__tgt").as("target_text"))
  }
}
