package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** GC of crash debris for the marker-generation METER stores
  * ([[BudgetStream]] `m_*` segments, [[QualityStream]] `seg_*`
  * segments) — the [[graft.operators.Dedup.FingerprintStore
  * .purgeSuperseded]] analog the meters were missing.
  *
  * A compaction commits by renaming its `gen_<n>` marker and only THEN
  * deletes the previous generation and the folded segments; a crash in
  * that window leaves debris that is invisible to every reader (stale
  * markers lose by ordering, folded segments are excluded by the
  * `foldedBelow` id bound) but — unlike FingerprintStore, whose next
  * compact re-folds every committed segment — is never reclaimed by
  * the meters' next compact either, because it filters segments at
  * `id >= prevBelow`. Without this purge, such segments, stale
  * generation markers/data dirs, and `gen_*.tmp` commit files
  * accumulate forever.
  *
  * Deletes, in order: every NON-newest generation marker and its data
  * dir; leftover `gen_*.tmp` files; committed segments with
  * `id < foldedBelow` of the newest generation. Safe whenever the
  * single writer isn't mid-compact; a crash mid-purge just leaves less
  * debris for the next purge.
  */
private[streaming] object MeterGc {

  /** @param segPrefix segment-directory prefix (`"m_"` / `"seg_"`)
    * @return paths deleted
    */
  def purgeSuperseded(
      s: SparkSession, dir: String, segPrefix: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    def marker(st: org.apache.hadoop.fs.FileStatus): Option[(String, Long)] = {
      val in = fs.open(st.getPath)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      content.split("\t") match {
        case Array(sub, below) => scala.util.Try(below.toLong).toOption
          .map(sub -> _)
        case _ => None
      }
    }
    val markers = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("gen_\\d{5,}"))
      .sortBy(_.getPath.getName.stripPrefix("gen_").toLong)
    val deleted = Seq.newBuilder[String]
    markers.dropRight(1).foreach { st =>
      marker(st).foreach { case (sub, _) =>
        val data = new Path(p, sub)
        if (fs.exists(data)) {
          fs.delete(data, true)
          deleted += data.toString
        }
      }
      fs.delete(st.getPath, false)
      deleted += st.getPath.toString
    }
    fs.listStatus(p).toSeq
      .filter(st => st.isFile &&
        st.getPath.getName.matches("gen_\\d{5,}\\.tmp"))
      .foreach { st =>
        fs.delete(st.getPath, false)
        deleted += st.getPath.toString
      }
    // folded segments a crashed cleanup orphaned: strictly below the
    // committed bound, so no reader (and no replay) can ever want them
    markers.lastOption.flatMap(marker).foreach { case (_, foldedBelow) =>
      fs.listStatus(p).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(segPrefix))
        .filter(st => scala.util.Try(
          st.getPath.getName.stripPrefix(segPrefix).toLong).toOption
          .exists(_ < foldedBelow))
        .foreach { st =>
          fs.delete(st.getPath, true)
          deleted += st.getPath.toString
        }
    }
    deleted.result()
  }
}
