package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Vocab

/** Rule-based classifiers, expressed as native `Column` builders (CaseWhen
  * chains) instead of the reference's Python UDFs — fully Catalyst-visible,
  * codegen'd, and null-safe, so the hot path never leaves whole-stage codegen.
  */
object Classify {

  /** U1 — `label_mood` (reference: jobs/spark_mood_tracker.py:93-108).
    *
    * Exact semantics preserved:
    *   - avg_speed IS NULL OR weather IS NULL  → "unknown"  (sentinel null
    *     sentiment alone does NOT force unknown)
    *   - sentiment = 'negative'                → "tense"
    *   - speed > 60 AND weather relaxing       → "relaxed"
    *   - speed < 30 AND weather stressful      → "stressed"
    *   - speed < 30 AND weather relaxing       → "slowed_but_chill"
    *   - speed > 60 AND weather stressful      → "fast_but_gloomy"
    *   - otherwise (incl. speeds in [30,60] and weather='unknown') → "normal"
    */
  def moodLabel(avgSpeed: Column, weather: Column, sentiment: Column): Column = {
    val relaxing = weather.isin(Vocab.RelaxingWeather: _*)
    val stressful = weather.isin(Vocab.StressfulWeather: _*)
    when(avgSpeed.isNull || weather.isNull, "unknown")
      .when(sentiment === "negative", "tense")
      .when(avgSpeed > 60 && relaxing, "relaxed")
      .when(avgSpeed < 30 && stressful, "stressed")
      .when(avgSpeed < 30 && relaxing, "slowed_but_chill")
      .when(avgSpeed > 60 && stressful, "fast_but_gloomy")
      .otherwise("normal")
  }

  /** U2 — `classify_news` (reference: jobs/spark_news_consumer.py:27-34).
    * Negative keywords win over positive. Documented divergence from the
    * reference: a NULL headline yields "neutral" instead of crashing the
    * Python worker (the reference UDF calls .lower() on None).
    */
  def newsSentiment(headline: Column): Column = {
    val lowered = lower(headline)
    val neg = Vocab.NegativeNews.map(k => lowered.contains(k)).reduce(_ || _)
    val pos = Vocab.PositiveNews.map(k => lowered.contains(k)).reduce(_ || _)
    when(headline.isNull, "neutral")
      .when(neg, "negative")
      .when(pos, "positive")
      .otherwise("neutral")
  }

  /** P6 — traffic bucketing (reference: jobs/spark_traffic_consumer.py:27-32).
    * NULL speed falls through to "light" exactly like the reference's
    * `otherwise` branch (when(null<30) is null → not taken).
    */
  def trafficCondition(speed: Column): Column =
    when(speed < 30, "heavy")
      .when(speed < 60, "moderate")
      .otherwise("light")
}
