package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Word-level vocabulary construction and token-id ENCODING — the step
  * between curation and tensorization: fix a pruned vocabulary (drop
  * rare tokens, the classic min-count cut), assign stable integer ids,
  * and rewrite every document as its id sequence with out-of-vocabulary
  * tokens mapped to the reserved `<unk>` id 0. The word-level complement
  * to the subword BPE encoder ([[Bpe]]): corpora whose models use a
  * closed vocabulary (classic LMs, retrieval embedding baselines) encode
  * here without a merge table.
  *
  * Determinism contract: ids are 1..V by (count DESC, token ASC) — a
  * pure function of the corpus, so re-runs, engines, and partitionings
  * agree; id 0 is always `<unk>`. Encoded order is the document's token
  * order (position-keyed re-assembly, never `collect_list` arrival
  * order).
  */
object Vocab {

  /** Pruned vocabulary: tokens with ≥ `minCount` occurrences, with
    * counts and dense ids 1..V by (count DESC, token ASC).
    *
    * Scale shape: the corpus-token-sized stream collapses at the
    * vocabulary before its exchange (map-side partial aggregation); the
    * id assignment is ONE window over the PRUNED vocabulary — a bounded
    * frame by contract (vocabularies are linguistic objects, not
    * corpora; the min-count cut bounds it further), the same boundedness
    * that lets [[LmScore.bigramPerplexity]] broadcast its model.
    */
  def build(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, "Vocab.build: minCount must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok").asc)
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("id", row_number().over(w).cast("long"))
  }

  /** Encode every document as its token-id sequence over `vocab`
    * (a [[build]] result): OOV tokens become id 0 (`<unk>`). Emits the
    * sequence as a comma-joined string — the scalar form a hash gate
    * can verify (and a trainer's loader splits back in O(n)).
    *
    * Scale shape: tokens explode with their POSITION, probe the
    * broadcast vocabulary map-side, and re-assemble under one doc-keyed
    * aggregation — `array_sort` on (pos, id) structs makes the result
    * independent of `collect_list` arrival order. One corpus-sized
    * shuffle (the doc-keyed re-assembly), inherent to re-ordering.
    *
    * Output: (`idCol`, n_tokens, n_unk, ids_csv) — ONE ROW PER INPUT
    * DOCUMENT: a zero-token document (empty/whitespace/null text)
    * emits (0, 0, "") rather than silently dropping, so a pipeline
    * consumer's row count survives the encode stage. The outer explode
    * carries such docs through on a null-position row that every
    * aggregate ignores.
    */
  def encode(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode_outer(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
    toks
      .join(broadcast(vocab.select(col("tok"), col("id"))), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        when(col("tok").isNotNull, coalesce(col("id"), lit(0L))).as("id"))
      .groupBy(col(idCol))
      .agg(count(col("pos")).as("n_tokens"),
        sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_unk"),
        array_join(transform(
          array_sort(collect_list(
            when(col("pos").isNotNull, struct(col("pos"), col("id"))))),
          s => s.getField("id").cast("string")), ",").as("ids_csv"))
  }
}
