package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge (CDC upsert/delete) — the operator that keeps a 100 TB
  * curated table current: a base snapshot plus a (much smaller) batch
  * of changed rows and tombstones, latest version per key wins. The
  * classic copy-on-write merge a lakehouse table format performs on
  * write, expressed as a plain dataflow so it composes with the rest
  * of the engine.
  */
object Merge {

  /** Column name a tombstone-keeping merge carries on its output (and
    * accepts on its base): true marks a key whose latest change is a
    * delete. Persisting the flag is what makes sequential batch
    * application equal a single global latest-wins replay — a table
    * that physically dropped the row would let a LATER-arriving but
    * LOWER-versioned update resurrect the key.
    */
  val TombstoneCol = "__tombstone"

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
    * Exchange). At 100 TB the base side dominates; a Union discards
    * its children's partitioning, so THIS shape always shuffles the
    * base — use [[upsertLatestKeyed]] against a key-bucketed base
    * table to confine the shuffle to the updates side. Deletes ride
    * [[applyChanges]]' tombstone path.
    */
  def upsertLatest(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame =
    // the empty-deletes union child is pruned by the optimizer
    // (limit-0 → empty LocalRelation → PropagateEmptyRelation), so the
    // physical plan is identical to a two-way merge
    applyChanges(base, updates,
      base.limit(0).select((keyCols :+ versionCol).map(col): _*),
      keyCols, versionCol)

  /** [[upsertLatest]] for a MAINTAINED base table — one that already
    * holds at most one row per key (what every merge in this file
    * outputs) — shaped so a key-bucketed base never shuffles: the
    * updates collapse to their per-key winner first (one Exchange over
    * the SMALL side), then a full-outer join against the base picks
    * the survivor per key, updates beating base at equal versions.
    * When the base is a table bucketed (and sorted) by the key, the
    * join reads it co-located — the plan's ONLY Exchange is the
    * updates side (spec-asserted via SelectedBucketsCount + exchange
    * count). This is the 100 TB ingest-loop shape: the billion-row
    * base pays a local sort-merge against yesterday's layout, the
    * million-row batch pays the lone shuffle. Semantics are pinned to
    * [[upsertLatest]] by a bit-equality spec; the union+window form
    * stays the general path (it also accepts multi-row-per-key bases).
    * Size `buckets` to the ingest parallelism (mismatched bucket vs
    * shuffle-partition counts make the planner fall back to a
    * re-shuffle of both sides).
    */
  def upsertLatestKeyed(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(!(base.columns ++ updates.columns)
      .exists(c => c == "__rn" || c == "__b" || c == "__u"),
      "upsertLatestKeyed reserves __rn/__b/__u as working columns")
    val missing = base.columns.filterNot(updates.columns.contains)
    require(missing.isEmpty,
      s"updates must carry every base column; missing: ${missing.mkString(", ")}")
    val nonKey = base.columns.filterNot(keyCols.contains).toSeq
    // per-key winner among the updates: same deterministic order as
    // applyChanges (version desc, then content-desc tie-break) so a
    // replayed batch reproduces the identical survivor
    val tieExprs = base.schema.fields
      .filterNot(f => keyCols.contains(f.name) || f.name == versionCol)
      .toSeq.map { f =>
        if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
          col(f.name).desc
        else xxhash64(to_json(struct(col(f.name)))).desc
      }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: tieExprs: _*)
    val u1 = updates.select(base.columns.map(col).toSeq: _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // pack each side's payload into one struct so the full-outer join's
    // null-side detection is a single IsNull; the projection preserves
    // the base scan's bucketed output partitioning
    val bs = base.select(keyCols.map(col) :+
      struct(nonKey.map(col): _*).as("__b"): _*)
    val us = u1.select(keyCols.map(col) :+
      struct(nonKey.map(col): _*).as("__u"): _*)
    val winner = when(col("__u").isNull, col("__b"))
      .when(col("__b").isNull, col("__u"))
      // exact-version tie goes to the update (the CDC convention)
      .when(col("__u").getField(versionCol) >= col("__b").getField(versionCol),
        col("__u"))
      .otherwise(col("__b"))
    bs.join(us, keyCols, "full_outer")
      .select(keyCols.map(col) :+ winner.as("__w"): _*)
      .select(keyCols.map(col) ++ nonKey.map(c => col(s"__w.$c")): _*)
  }

  /** Latest-wins merge of `updates` AND `deletes` into `base`. A
    * delete is (key, version) — it wins the key iff no update/base row
    * carries a higher version, beating data rows on exact version ties
    * (a retraction issued at the version it retracts must apply).
    *
    * `deletes` carries at least `keyCols :+ versionCol`; any further
    * column it carries (e.g. a partitioned table's partition column)
    * is carried onto the persisted tombstone row rather than padded
    * null, so a direct reader or partition-pruning scan can still
    * attribute the tombstone to its partition. With
    * `keepTombstones = true` the winner rows INCLUDE deleted keys,
    * flagged by [[TombstoneCol]] (payload columns null) — the form a
    * versioned table persists so late lower-versioned changes cannot
    * resurrect a deleted key (see [[graft.streaming.ParquetUpsertTable]]);
    * `base` may itself carry the flag from a previous merge. With
    * `keepTombstones = false` (default) deleted keys are dropped from
    * the output. Tombstones accumulate one row per deleted key; at
    * 100 TB, purge those older than the pipeline's max change lateness
    * during periodic compaction (they are a filter, not a merge cost —
    * one boolean column through the same single shuffle).
    *
    * `allowSchemaEvolution = true` accepts an `updates` frame whose
    * payload columns are a superset of `base`'s (the lakehouse
    * schema-evolution convention): new columns ride through, base rows
    * read null there. Update rows still replace the WHOLE row — a
    * column the updates frame omits entirely is null on update winners
    * too, so it refuses frames MISSING base payload columns (partial
    * updates are a different operator); keys and the version column
    * must always be present.
    */
  /** Additive fold of a delta's per-key partial aggregates into a
    * maintained aggregate-state table — incremental MATERIALIZED-VIEW
    * maintenance for the sum/count family: after every fold the state
    * equals the one-shot aggregate over all data ever folded, but each
    * fold touches only the delta plus one join against the state.
    *
    * `base` and `deltaAgg` share the schema `keyCols ++ additive
    * columns`; the fold is a null-safe full-outer join on the keys with
    * column-wise addition (typed zero for the side missing a key; a
    * group whose partials are NULL on BOTH sides stays NULL, matching
    * SQL's sum over an all-null group), cast
    * back to the base column's type so the state schema is FIXED across
    * folds (size the decimal for the lifetime total, not the delta).
    * avg/stddev derive from (sum, count) states; min/max fold the same
    * way with `greatest`/`least` — not provided here because they are
    * not retractable.
    *
    * Scale shape: the lone data-sized cost is aggregating the delta
    * BEFORE the fold (caller does it, so the partial agg fuses with the
    * delta scan); the join is state-sized. Against a key-bucketed state
    * table the join reads the state co-located — only the (small) delta
    * partials shuffle, exactly the [[upsertLatestKeyed]] property
    * (plan-asserted in CurationSpec).
    */
  /** @param nullSafeKeys true (default) joins with `<=>` so a NULL key
    *   (e.g. day-of-null-timestamp) stays ONE state group across folds;
    *   Spark plans null-safe keys as derived (coalesce, isnull) pairs,
    *   which a key-bucketed layout cannot satisfy — so a bucketed state
    *   table only skips its exchange with `nullSafeKeys = false`, the
    *   right setting when keys are known non-null (enforce at ingest).
    *   This is the real tradeoff, not an implementation shortcut:
    *   bucket-co-located null-safe joins would need the layout itself
    *   to hash the derived keys.
    */
  def foldAdditive(
      base: DataFrame,
      deltaAgg: DataFrame,
      keyCols: Seq[String],
      nullSafeKeys: Boolean = true): DataFrame = {
    require(base.columns.sorted.sameElements(deltaAgg.columns.sorted),
      s"state/delta schemas differ: ${base.columns.mkString(",")} vs " +
        deltaAgg.columns.mkString(","))
    val addCols = base.columns.filterNot(keyCols.contains).toSeq
    val b = base.as("b")
    val d = deltaAgg
      .select(keyCols.map(col) ++ addCols.map(c => col(c).as(s"__d_$c")): _*)
      .as("d")
    val cond = keyCols.map { k =>
      if (nullSafeKeys) col(s"b.$k") <=> col(s"d.$k")
      else col(s"b.$k") === col(s"d.$k")
    }.reduce(_ && _)
    b.join(d, cond, "full_outer").select(
      keyCols.map(k => coalesce(col(s"b.$k"), col(s"d.$k")).as(k)) ++
        addCols.map { c =>
          val t = base.schema(c).dataType
          val zero = lit(0).cast(t)
          // both-NULL stays NULL: SQL sum over an all-null group is NULL,
          // and the fold must equal the one-shot aggregate — substituting
          // the typed zero is only correct when at least one side carries
          // a real partial (a NULL partial folded with a real one drops
          // out, exactly like sum ignoring nulls)
          when(col(s"b.$c").isNull && col(s"__d_$c").isNull,
            lit(null).cast(t))
            .otherwise(
              (coalesce(col(s"b.$c"), zero) + coalesce(col(s"__d_$c"), zero))
                .cast(t)).as(c)
        }: _*)
  }

  def applyChanges(
      base: DataFrame,
      updates: DataFrame,
      deletes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      keepTombstones: Boolean = false,
      allowSchemaEvolution: Boolean = false): DataFrame = {
    require(!(base.columns ++ updates.columns ++ deletes.columns)
      .exists(c => c == "__src" || c == "__rn"),
      "applyChanges reserves __src/__rn as working columns")
    require(!updates.columns.contains(TombstoneCol) &&
      !deletes.columns.contains(TombstoneCol),
      s"$TombstoneCol is engine-managed; only base may carry it")
    val missingFromUpdates = base.columns
      .filterNot(c => c == TombstoneCol || updates.columns.contains(c))
    require(missingFromUpdates.isEmpty,
      s"updates must carry every base column (full-row replacement); " +
        s"missing: ${missingFromUpdates.mkString(", ")}")
    val newCols = updates.schema.fields
      .filterNot(f => base.columns.contains(f.name)).toSeq
    require(allowSchemaEvolution || newCols.isEmpty,
      s"updates carry columns absent from base " +
        s"(${newCols.map(_.name).mkString(", ")}); pass " +
        "allowSchemaEvolution = true to widen the table")
    val b0 = {
      // evolution: base rows read null in the batch's new columns
      val widened = newCols.foldLeft(base)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
      if (widened.columns.contains(TombstoneCol)) widened
      else widened.withColumn(TombstoneCol, lit(false))
    }
    val dataFields = b0.schema.fields.filterNot(_.name == TombstoneCol).toSeq
    // pad tombstones to the table schema: key + version (and any other
    // column the deletes frame carries, e.g. a partition column)
    // carried; remaining payload columns null — they never surface
    // unless keepTombstones. Keys/version stay unconditional so a
    // deletes frame MISSING one fails resolution instead of silently
    // padding a null key.
    val delPadded = deletes.select(dataFields.map { f =>
      if (keyCols.contains(f.name) || f.name == versionCol ||
          deletes.columns.contains(f.name))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*).withColumn(TombstoneCol, lit(true))
    val unioned = b0.withColumn("__src", lit(0))
      .unionByName(updates.withColumn(TombstoneCol, lit(false))
        .withColumn("__src", lit(1)))
      .unionByName(delPadded.withColumn("__src", lit(2)))
    // full deterministic order: after (version, tombstone, source),
    // ties — two change rows for one key at the SAME version in one
    // batch — are broken by the remaining columns, so a replayed batch
    // reproduces the identical winner (UpsertSink's exactly-once
    // rewrite depends on this; a bare (version, src) order left the
    // survivor to shuffle arrival order). Non-orderable columns
    // (MapType payloads) can't sit in an ORDER BY — stand in a content
    // hash of their JSON rendering, which preserves the
    // replay-determinism guarantee (equal content → equal rank).
    val tieExprs = dataFields
      .filterNot(f => keyCols.contains(f.name) || f.name == versionCol)
      .map { f =>
        if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
          col(f.name).desc
        else xxhash64(to_json(struct(col(f.name)))).desc
      }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: col(TombstoneCol).desc +:
        col("__src").desc +: tieExprs): _*)
    val merged = unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    if (keepTombstones) merged
    else merged.filter(!col(TombstoneCol)).drop(TombstoneCol)
  }

  /** Change-data-feed between two snapshots of a keyed table (the
    * lakehouse `table_changes` read): full-outer join on the keys, one
    * row per changed key with `change_type` ∈ insert/update/delete and
    * every non-key column twice (`<c>_before`, `<c>_after`). Unchanged
    * keys (all non-key columns null-safely equal) are dropped.
    * Schemas must agree on the non-key columns.
    *
    * Scale: ONE key shuffle per side (none at all when both snapshots
    * are read from a key-bucketed layout — the upsertLatestKeyed
    * argument); change detection is a codegen'd null-safe conjunction,
    * no per-column joins. Feed it `snapshotAt(v1)` / `snapshotAt(v2)`
    * of a [[graft.streaming.ParquetUpsertTable]] to answer "what did
    * batches v1+1..v2 do to the table" without replaying them.
    */
  def diffSnapshots(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val valCols = after.columns.filterNot(keyCols.contains).toSeq
    require(before.columns.filterNot(keyCols.contains).toSeq == valCols,
      "diffSnapshots: before/after non-key columns must match " +
        s"(${before.columns.mkString(",")} vs ${after.columns.mkString(",")})")
    // presence markers survive the outer join where data columns can be
    // legitimately null
    val b = before.select(
      keyCols.map(col) ++ valCols.map(c => col(c).as(s"${c}_before")) :+
        lit(true).as("__b"): _*)
    val a = after.select(
      keyCols.map(col) ++ valCols.map(c => col(c).as(s"${c}_after")) :+
        lit(true).as("__a"): _*)
    val changed = valCols
      .map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__b").isNull, lit("insert"))
          .when(col("__a").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop("__b", "__a")
  }
}
