package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge (CDC upsert) — the operator that keeps a 100 TB curated
  * table current: a base snapshot plus a (much smaller) batch of
  * changed rows, latest version per key wins. The classic
  * copy-on-write merge a lakehouse table format performs on write,
  * expressed as a plain dataflow so it composes with the rest of the
  * engine.
  */
object Merge {

  /** Latest-wins upsert of `updates` into `base`: one row per key,
    * ordered by `versionCol` descending with `updates` beating `base`
    * on exact ties (the CDC convention — a correction that does not
    * advance the version must still apply). Schemas must match by
    * name.
    *
    * Shape: union → one shuffle on the key → per-key top-1 via
    * row_number (partial ordering inside the shuffle's sort, no global
    * sort). Spark 4 plans the rn=1 filter as WindowGroupLimit on BOTH
    * sides of the exchange — each map task keeps only its local top-1
    * per key before shuffling, so a key updated many times ships one
    * row, not its history (plan-asserted: exactly one key-partitioned
    * Exchange). At 100 TB the base side dominates; if the base table
    * is bucketed by the key, the union's shuffle degrades to the
    * updates side only. Deletes compose as an anti-join before calling
    * this (tombstones are a filter, not a merge concern).
    */
  def upsertLatest(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(!(base.columns ++ updates.columns).exists(c => c == "__src" || c == "__rn"),
      "upsertLatest reserves __src/__rn as working columns")
    val unioned = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    // full deterministic order: after (version, source), ties — two
    // change rows for one key at the SAME version in one batch — are
    // broken by the remaining columns, so a replayed batch reproduces
    // the identical winner (UpsertSink's exactly-once rewrite depends
    // on this; a bare (version, src) order left the survivor to
    // shuffle arrival order). Non-orderable columns (MapType payloads)
    // can't sit in an ORDER BY — stand in a content hash of their JSON
    // rendering, which preserves the replay-determinism guarantee
    // (equal content → equal rank either way).
    val tieExprs = base.schema.fields.toSeq
      .filterNot(f => keyCols.contains(f.name) || f.name == versionCol)
      .map { f =>
        if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
          col(f.name).desc
        else xxhash64(to_json(struct(col(f.name)))).desc
      }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: col("__src").desc +: tieExprs): _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
