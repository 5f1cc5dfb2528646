package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Merge

/** Streaming CDC apply — the missing half of [[graft.operators.Merge]]:
  * a stream of change rows applied, one micro-batch at a time, to a
  * keyed parquet table (copy-on-write, like a lakehouse MERGE without
  * the format dependency).
  *
  * Layout: `dir/v_<batchId>` immutable version directories plus a tiny
  * `_LATEST` marker naming the committed version. A reader always
  * resolves the marker first, so it never sees a half-written version;
  * a crash between version write and marker commit leaves the marker
  * on the previous version and the replayed batch overwrites the
  * partial directory (exactly-once table state from at-least-once
  * batch delivery — the same idempotence contract Structured
  * Streaming's foreachBatch asks of a sink).
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
  require(keepVersions >= 1, "keepVersions must be >= 1")

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def marker = new Path(root, "_LATEST")

  /** Name of the committed version (e.g. "v_00000000000000000003"). */
  def latestVersion: Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(marker), java.nio.charset.StandardCharsets.UTF_8))
      try Option(in.readLine()).map(_.trim).filter(_.nonEmpty)
      finally in.close()
    }

  /** The committed table state; None before the first commit. */
  def snapshot(): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(new Path(root, v).toString))

  /** Merge one micro-batch of change rows (latest-wins per key, see
    * Merge.upsertLatest) into a NEW version directory, then atomically
    * repoint `_LATEST`. Old versions beyond `keepVersions` are removed
    * AFTER the commit, so a concurrent reader holding the previous
    * marker value still finds its files during the handoff window.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val version = f"v_$batchId%020d"
    // versions commit in batch order, so a marker at or past this id
    // means the batch's changes are already folded into the table —
    // skip the rewrite instead of regressing the marker (at-least-once
    // replay after a checkpoint/table race)
    if (latestVersion.exists(_ >= version)) return
    val target = new Path(root, version)
    val merged = snapshot() match {
      case Some(base) => Merge.upsertLatest(base, batch, keyCols, versionCol)
      case None => Merge.upsertLatest(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.schema), batch, keyCols, versionCol)
    }
    // reads the PREVIOUS version dir while writing the new one — never
    // the same files, so the lazy merge plan is safe to execute here
    merged.write.mode("overwrite").parquet(target.toString)
    val out = fs.create(marker, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val stale = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_"))
      .map(_.getPath.getName).sorted.dropRight(keepVersions)
      .filter(_ < version) // never GC a replayed-future version
    stale.foreach(v => fs.delete(new Path(root, v), true): Unit)
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(table.sink)`. */
  def sink: (DataFrame, Long) => Unit = (batch, id) => applyBatch(batch, id)
}
