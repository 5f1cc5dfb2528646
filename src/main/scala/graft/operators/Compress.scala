package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal — the redundancy gate char-level
  * entropy (q164) cannot provide: repeating a paragraph ten times
  * leaves the CHARACTER distribution (and so the entropy) of the text
  * essentially unchanged, but collapses its deflate size. Gopher-class
  * rule sets pair the two: entropy catches keyboard mash and floods,
  * the compression ratio catches self-repeating template spam,
  * keyword-stuffed pages, and boilerplate loops.
  *
  * Ratio is all-integer (`deflate_bytes × 10000 div n_bytes`, the
  * pp10k discipline); the deflate size comes from the codegen'd
  * [[org.apache.spark.sql.graft.DeflateSize]] kernel, so the operator
  * is MAP-ONLY on the scan — no UDF wall, no shuffle, no explode.
  *
  * The absolute deflate byte count is zlib-build-bound (deterministic
  * within a run, not a cross-engine constant), so gates certify the
  * VERDICT (a planted self-repetition must fall under the floor;
  * natural text must clear it) rather than hashing the ratio — the
  * q27/q183 certification pattern.
  *
  * One row per input document: empty or NULL text yields
  * (0, 0, NULL ratio, keep = false) — the q136/q164 shape.
  */
object Compress {

  /** Per-document deflate ratio: (`idCol`, n_bytes, deflate_bytes,
    * ratio_pp10k, keep) with `ratio_pp10k = deflate_bytes * 10000 div
    * n_bytes` and `keep = ratio_pp10k ≥ keepMinPp10k` (incompressible
    * enough = not degenerate repetition).
    */
  def deflateRatio(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      keepMinPp10k: Long): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val dz = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.DeflateSize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))
    docs.select(col(idCol),
        octet_length(text).cast("long").as("n_bytes"),
        dz.as("deflate_bytes"))
      .withColumn("ratio_pp10k",
        when(col("n_bytes") > 0,
          expr("deflate_bytes * 10000 div n_bytes")))
      .withColumn("keep",
        coalesce(col("ratio_pp10k") >= keepMinPp10k, lit(false)))
  }
}
