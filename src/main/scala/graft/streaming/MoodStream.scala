package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.ops.{Aggregates, Classify, Joins}
import graft.pipeline.MoodPipeline

/** Streaming composition of the flagship mood dataflow (reference:
  * jobs/spark_mood_tracker.py end-to-end, §2.9 semantics inventory).
  *
  * Two execution strategies, both producing the reference's output schema:
  *
  *  1. [[aggregatedJoined]] — the full multi-stateful chain: watermark ×3 →
  *     per-minute aggregations ×3 → stream-stream left-outer joins ×2 →
  *     classification, in append mode. Requires Spark ≥3.4 watermark
  *     propagation (SURVEY.md §7 risk #1). State per operator is bounded by
  *     the 1-minute watermark; join state holds ≤ (watermark + minute) of
  *     per-minute rows per side — O(intersections) rows, trivially scalable.
  *
  *  2. [[foreachBatchAligned]] — reference-faithful fallback: only the three
  *     aggregations run as streaming state; each micro-batch's completed
  *     minutes are aligned + classified with a BATCH join inside
  *     foreachBatch (what the reference's sink-side flow effectively does,
  *     minus its driver-side toPandas collect — ours stays distributed).
  *
  * Unlike the reference, every writer REQUIRES a checkpoint location
  * (the reference configures none and silently loses state on restart —
  * BASELINE.md "checkpointing: none").
  */
object MoodStream {

  /** Watermarked per-minute aggregations of the three parsed streams.
    * Inputs carry `timestamp` (+ traffic: intersection, speed; weather:
    * temp, weather; news: sentiment).
    */
  def aggregates(
      traffic: DataFrame,
      weather: DataFrame,
      news: DataFrame,
      watermark: String = "1 minute"): (DataFrame, DataFrame, DataFrame) = {
    def prep(df: DataFrame): DataFrame =
      MoodPipeline.withEventTime(df).withWatermark("event_time", watermark)
    (
      Aggregates.trafficPerMinute(prep(traffic)),
      Aggregates.weatherPerMinute(prep(weather)),
      Aggregates.newsPerMinute(prep(news)))
  }

  /** Strategy 1: full streaming chain (agg ×3 → left join ×2 → classify). */
  def aggregatedJoined(
      traffic: DataFrame,
      weather: DataFrame,
      news: DataFrame,
      watermark: String = "1 minute"): DataFrame = {
    val (t, w, n) = aggregates(traffic, weather, news, watermark)
    MoodPipeline.classifyAligned(Joins.alignMinutes(t, w, n))
      .select("event_time", "intersection", "avg_speed", "avg_temp",
        "weather", "sentiment", "mood")
  }

  /** Strategy 2: stream the three aggregations, align + classify per
    * micro-batch via a batch join (distributed, never collected), hand the
    * classified frame to `sink`.
    *
    * The three aggregation streams are unioned with a discriminator column
    * into ONE streaming query (one checkpoint, one trigger), then split
    * again inside foreachBatch — the same technique the reference needed
    * two separate queries for (jobs/spark_news_consumer.py:39-58 double-read).
    */
  def foreachBatchAligned(
      traffic: DataFrame,
      weather: DataFrame,
      news: DataFrame,
      checkpoint: String,
      watermark: String = "1 minute")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val (t, w, n) = aggregates(traffic, weather, news, watermark)
    val unioned =
      t.select(lit("t").as("side"), col("event_time"), col("intersection"),
          col("avg_speed"), lit(null).cast("double").as("avg_temp"),
          lit(null).cast("string").as("weather"), lit(null).cast("string").as("sentiment"))
        .unionAll(w.select(lit("w").as("side"), col("event_time"),
          lit(null).cast("string").as("intersection"),
          lit(null).cast("double").as("avg_speed"), col("avg_temp"), col("weather"),
          lit(null).cast("string").as("sentiment")))
        .unionAll(n.select(lit("n").as("side"), col("event_time"),
          lit(null).cast("string").as("intersection"),
          lit(null).cast("double").as("avg_speed"), lit(null).cast("double").as("avg_temp"),
          lit(null).cast("string").as("weather"), col("sentiment")))
    unioned.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t = batch.filter(col("side") === "t")
          .select("event_time", "intersection", "avg_speed")
        val w = batch.filter(col("side") === "w")
          .select("event_time", "avg_temp", "weather")
        val n = batch.filter(col("side") === "n")
          .select("event_time", "sentiment")
        val aligned = MoodPipeline.classifyAligned(Joins.alignMinutes(t, w, n))
          .select("event_time", "intersection", "avg_speed", "avg_temp",
            "weather", "sentiment", "mood")
        sink(aligned, batchId)
      }
  }

  /** Start strategy 1 into a parquet append sink (checkpointed). */
  def startToParquet(
      classified: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    classified.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
}
