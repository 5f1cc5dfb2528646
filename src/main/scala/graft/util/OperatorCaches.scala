package graft.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for persisted intermediates that operators
  * MUST keep alive past their own return (the returned frame is lazy and
  * reads the cached intermediate at the caller's terminal action, so the
  * operator itself can never unpersist).
  *
  * Operators that persist such an intermediate (`Dedup.allPairsJaccard`'s
  * token lists, `Layout.tokenShards`' range-partitioned frame,
  * `Dedup.incrementalSpanCore`'s tokenized base + occurrence frames)
  * register it here. The CALLER owns release: after the terminal action
  * on the operator's result, call [[release]] — it unpersists exactly the
  * operator-registered frames of that session, leaving the caller's own
  * caches intact (unlike `spark.catalog.clearCache()`, which the
  * Bench/Verify harnesses use because they own the whole session).
  *
  * Registration is weak per session (a stopped session's entries are
  * collectable) and thread-safe; `blocking = false` on unpersist so
  * release never stalls the caller on block eviction.
  */
object OperatorCaches {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, mutable.Buffer[DataFrame]]()

  /** Persist `df` at `level` and register it for its session. Returns
    * `df` for inline use: `val lists = OperatorCaches.persisted(...)`.
    */
  def persisted(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    bySession.synchronized {
      var buf = bySession.get(df.sparkSession)
      if (buf == null) {
        buf = mutable.Buffer.empty[DataFrame]
        bySession.put(df.sparkSession, buf)
      }
      buf += df
    }
    df
  }

  /** Number of still-registered (not yet released) frames for `spark`. */
  def registeredCount(spark: SparkSession): Int = bySession.synchronized {
    Option(bySession.get(spark)).map(_.size).getOrElse(0)
  }

  /** Unpersist every operator-registered frame of `spark` and clear the
    * registry. Safe to call at any time — frames whose results were
    * already materialized simply drop their blocks; frames not yet
    * evaluated recompute from lineage if later used (deterministic for
    * every registering operator).
    */
  def release(spark: SparkSession): Unit = {
    val frames = bySession.synchronized {
      val buf = bySession.remove(spark)
      if (buf == null) Seq.empty else buf.toSeq
    }
    frames.foreach(f => try f.unpersist(blocking = false) catch {
      case _: Throwable => () // session already stopped — nothing to free
    })
  }
}
