package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-distribution Shannon entropy — the gibberish/keyboard-mash
  * quality signal (C4 and Gopher-style rule sets gate on it: natural
  * language sits near 2.6–3.2 nats/char, single-character floods and
  * binary-pasted junk fall far below). All-integer end to end, the
  * q136 micro-nat discipline: each per-character term snaps to
  * `cnt × round(ln(n/cnt) × 1e6)` — `ln` of a ratio of exact-integer-
  * valued doubles, where a 1-ulp divergence between engines moves the
  * value ~1e-9 of a micro-nat, nowhere near the 0.5 rounding margin —
  * and a document's `entropy_sum_micro` is the exact long sum, so a
  * SQL oracle reproduces every bit.
  *
  * Scale shape: one (doc, char)-keyed aggregation (map-side partial
  * combine collapses the explode to ≤ alphabet-size rows per doc
  * BEFORE the exchange), then a doc-keyed window over those ≤ |Σ| rows
  * — no corpus-sized second shuffle, no floats, no UDFs.
  *
  * One row per input document ([[Vocab.encode]]'s contract): empty or
  * NULL text yields (0, 0, 0, NULL, keep = false) — the q136 shape
  * (average undefined on an empty distribution goes NULL, keep snaps
  * false).
  */
object Entropy {

  /** Per-document char entropy: (`idCol`, n_chars, distinct_chars,
    * entropy_sum_micro, entropy_micro, keep) with
    * `entropy_micro = entropy_sum_micro div n_chars` (floor) and
    * `keep = entropy_micro ≥ keepMinMicroNats` — i.e. the document's
    * average per-character surprise reaches the floor.
    */
  def charEntropy(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      keepMinMicroNats: Long): DataFrame = {
    val chars = docs.select(col(idCol),
      explode(regexp_extract_all(
        coalesce(col(textCol), lit("")), lit("[\\s\\S]"), lit(0)))
        .as("__c"))
    val counts = chars.groupBy(col(idCol), col("__c"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(idCol))
    // integer micro-nats: ln of a ratio of exact-integer-valued doubles,
    // snapped per term, exact long sum (see scaladoc)
    val term = col("cnt") *
      round(log(col("__n").cast("double") / col("cnt").cast("double"))
        * 1e6).cast("long")
    val ent = counts
      .withColumn("__n", sum(col("cnt")).over(w))
      .groupBy(col(idCol))
      .agg(max(col("__n")).as("__nc"),
        count(lit(1)).as("__k"),
        sum(term).as("__es"))
    docs.select(col(idCol)).join(ent, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nc"), lit(0L)).as("n_chars"),
        coalesce(col("__k"), lit(0L)).as("distinct_chars"),
        coalesce(col("__es"), lit(0L)).as("entropy_sum_micro"),
        when(col("__nc") > 0, expr("__es div __nc")).as("entropy_micro"),
        coalesce(col("__nc") > 0 &&
          expr("__es div __nc") >= keepMinMicroNats, lit(false))
          .as("keep"))
  }
}
