package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops._

/** The flagship dataflow (reference: jobs/spark_mood_tracker.py end-to-end):
  * three event streams → minute truncation → per-minute aggregation →
  * temporal alignment (left joins) → mood classification.
  *
  * Pure `DataFrame => DataFrame` so the SAME composition runs in batch mode
  * (tests, oracle comparison, backfill) and under Structured Streaming
  * (graft.streaming.MoodStream) — batch exercises identical Catalyst plans
  * minus state.
  *
  * Inputs must carry the columns of Schemas.{traffic,weather,news} with a
  * raw `timestamp`; an `arrival` column (any monotone arrival key, e.g. the
  * event id or kafka offset) makes first-per-minute deterministic.
  */
object MoodPipeline {

  /** Normalize one topic: timestamp → minute-truncated event_time. */
  def withEventTime(df: DataFrame, tsCol: String = "timestamp"): DataFrame =
    df.withColumn("event_time", TimeOps.truncMinute(TimeOps.toEventTime(col(tsCol))))

  /** Batch/streaming-agnostic core: aggregated inputs → aligned + classified. */
  def classifyAligned(aligned: DataFrame): DataFrame =
    aligned.withColumn(
      "mood",
      Classify.moodLabel(col("avg_speed"), col("weather"), col("sentiment")))

  /** Full batch pipeline from raw (already-parsed) topic frames. */
  def run(
      traffic: DataFrame,
      weather: DataFrame,
      news: DataFrame,
      arrivalCol: String = ""): DataFrame = {
    val t = Aggregates.trafficPerMinute(withEventTime(traffic))
    val w = Aggregates.weatherPerMinute(withEventTime(weather), arrivalCol)
    val n = Aggregates.newsPerMinute(withEventTime(news), arrivalCol)
    classifyAligned(Joins.alignMinutes(t, w, n))
      .select("event_time", "intersection", "avg_speed", "avg_temp", "weather", "sentiment", "mood")
  }
}
