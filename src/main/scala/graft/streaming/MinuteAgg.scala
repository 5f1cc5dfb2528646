package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.ops.TimeOps

/** Update-mode per-minute aggregation — the UNBOUNDED-run counterpart of
  * the q26 gate variant (Queries.streamingMinuteAgg, complete mode).
  *
  * Complete mode rewrites the whole aggregate table every micro-batch —
  * fine when cardinality is bounded (the gate's minutes × event_types),
  * wrong for an open-ended production stream. Here state and per-batch
  * output are bounded by the watermark instead: each micro-batch emits
  * ONLY the (minute, key) rows it changed, rows older than the watermark
  * are dropped, and closed-minute state is evicted. The caller's `merge`
  * receives each changed-rows batch — at scale that is a keyed MERGE INTO
  * / KV upsert; executors never collect to the driver.
  */
object MinuteAgg {

  /** Per-minute count/sum over `keyCol`, update-mode, watermark-bounded.
    * `tsCol` must be a timestamp column; late rows (minute end older than
    * the watermark) are dropped by the aggregation state, not the sink.
    */
  def updateMinuteCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valCol: String,
      watermark: String = "1 minute")(
      merge: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events
      // the watermark must ride the GROUPING column: a plain keyed
      // aggregation (no window()) only drops late rows / evicts state when
      // the watermarked column itself is a grouping key
      .withColumn("minute", TimeOps.truncMinute(col(tsCol)))
      .withWatermark("minute", watermark)
      .groupBy(col("minute"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valCol)).as("sum_value"))
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch(merge)
}
