package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Merge

/** Streaming CDC apply — the missing half of [[graft.operators.Merge]]:
  * a stream of change rows applied, one micro-batch at a time, to a
  * keyed parquet table (copy-on-write, like a lakehouse MERGE without
  * the format dependency).
  *
  * Layout: immutable `dir/v_<batchId>` version directories; a version
  * is COMMITTED iff its `_SUCCESS` marker exists (the same gating as
  * Dedup.FingerprintStore), and the table state is the newest
  * committed version. The parquet job committer makes `_SUCCESS` the
  * last file to appear, so there is no separate pointer to repoint and
  * no window where a reader can resolve a half-written table: a crash
  * mid-write leaves a markerless directory that no reader sees and
  * that the replayed batch's overwrite reclaims (exactly-once table
  * state from at-least-once batch delivery — the idempotence contract
  * Structured Streaming's foreachBatch asks of a sink).
  *
  * Scale note: copy-on-write rewrites the full table per batch — right
  * for dimension-sized keyed tables (the reference's mood summary, a
  * training run's doc-status table), wrong for fact-sized ones; at
  * 100 TB, partition the table (Layout.compactByDay) and rewrite only
  * the partitions the batch touches, or use a merge-on-read format.
  */
class ParquetUpsertTable(
    spark: SparkSession,
    dir: String,
    keyCols: Seq[String],
    versionCol: String,
    keepVersions: Int = 2) {
  // >= 2: a concurrent reader that resolved the previous version must
  // still find its files after the next commit's GC (the handoff
  // guarantee in applyBatch's doc); 1 would delete the version a lazy
  // snapshot() frame is still scanning
  require(keepVersions >= 2, "keepVersions must be >= 2")

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version names (dirs whose `_SUCCESS` exists), oldest first. */
  def committedVersions: Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_"))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName).sorted

  /** Name of the newest committed version (e.g. "v_00000000000000000003"). */
  def latestVersion: Option[String] = committedVersions.lastOption

  /** The committed table state (live rows only); None before the first
    * commit. Deleted keys persist in storage as tombstone rows (see
    * [[graft.operators.Merge.TombstoneCol]]) so a late lower-versioned
    * change in a future batch cannot resurrect them — this read drops
    * them.
    */
  def snapshot(): Option[DataFrame] =
    snapshotFull().map { df =>
      if (df.columns.contains(Merge.TombstoneCol))
        df.filter(!col(Merge.TombstoneCol)).drop(Merge.TombstoneCol)
      else df // pre-tombstone table layout
    }

  /** The stored frame including tombstone rows — the merge input. */
  private def snapshotFull(): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(new Path(root, v).toString))

  /** Merge one micro-batch of change rows (latest-wins per key, see
    * Merge.upsertLatest) into a NEW version directory; the directory's
    * `_SUCCESS` marker IS the commit. Versions beyond `keepVersions`
    * are removed AFTER the commit, so a concurrent reader holding the
    * previous version still finds its files during the handoff window.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit =
    applyChanges(batch,
      batch.limit(0).select((keyCols :+ versionCol).map(col): _*), batchId)

  /** As [[applyBatch]] with tombstones: `deletes` is (keyCols,
    * versionCol) rows removing each key unless a higher-versioned
    * change exists (delete beats data on exact version ties). Deleted
    * keys are stored flagged, not dropped, so sequential batch
    * application stays equal to a single global latest-wins replay of
    * all changes (Merge.applyChanges' contract).
    */
  def applyChanges(updates: DataFrame, deletes: DataFrame, batchId: Long): Unit = {
    val version = f"v_$batchId%020d"
    // versions commit in batch order, so a committed version at or past
    // this id means the batch's changes are already folded into the
    // table — skip (at-least-once replay after a checkpoint/table race)
    if (latestVersion.exists(_ >= version)) return
    val target = new Path(root, version)
    val base = snapshotFull().getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        updates.schema))
    val merged = Merge.applyChanges(base, updates, deletes, keyCols,
      versionCol, keepTombstones = true)
    // reads the PREVIOUS version dir while writing the new one — never
    // the same files, so the lazy merge plan is safe to execute here;
    // overwrite reclaims a partial directory left by a crashed attempt
    merged.write.mode("overwrite").parquet(target.toString)
    val stale = committedVersions.dropRight(keepVersions)
      .filter(_ < version) // never GC a replayed-future version
    stale.foreach(v => fs.delete(new Path(root, v), true): Unit)
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(table.sink)`. */
  def sink: (DataFrame, Long) => Unit = (batch, id) => applyBatch(batch, id)
}
