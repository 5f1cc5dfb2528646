package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed event model for the city-mood engine.
  *
  * Schemas mirror the reference's explicit StructType declarations
  * (reference: jobs/spark_mood_tracker.py:11-26,
  * jobs/spark_traffic_consumer.py:10-14, jobs/spark_weather_consumer.py:10-14,
  * jobs/spark_news_consumer.py:6-8) re-expressed as case classes so module
  * boundaries get compile-time schema checks via `Dataset[T]`.
  */
final case class TrafficEvent(
    intersection: String,
    vehicle_id: String,
    speed: Option[Double],
    timestamp: Option[Timestamp])

final case class WeatherEvent(
    timestamp: Option[Timestamp],
    temp: Option[Double],
    windspeed: Option[Double],
    weather: String)

final case class NewsEvent(
    timestamp: Option[Timestamp],
    headline: String,
    sentiment: String)

/** One minute x intersection mood row (pipeline output; reference sink schema —
  * tests/unit/airflow/test_mongo_to_storage.py:31-39).
  */
final case class MoodRecord(
    event_time: Option[Timestamp],
    intersection: String,
    avg_speed: Option[Double],
    avg_temp: Option[Double],
    weather: String,
    sentiment: String,
    mood: String)

/** Daily-summary row (reference: my_airflow/dags/daily_summary_report.py:36-40). */
final case class MoodSummary(
    intersection: String,
    mood: String,
    records_count: Long,
    avg_speed: Option[Double],
    avg_temp: Option[Double])

object Schemas {
  /** reference: jobs/spark_mood_tracker.py:11-15 */
  val traffic: StructType = StructType(Seq(
    StructField("intersection", StringType),
    StructField("vehicle_id", StringType),
    StructField("speed", DoubleType),
    StructField("timestamp", TimestampType)))

  /** reference: jobs/spark_mood_tracker.py:17-21 */
  val weather: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("temp", DoubleType),
    StructField("windspeed", DoubleType),
    StructField("weather", StringType)))

  /** reference: jobs/spark_mood_tracker.py:23-26 */
  val news: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("headline", StringType),
    StructField("sentiment", StringType)))

  val mood: StructType = StructType(Seq(
    StructField("event_time", TimestampType),
    StructField("intersection", StringType),
    StructField("avg_speed", DoubleType),
    StructField("avg_temp", DoubleType),
    StructField("weather", StringType),
    StructField("sentiment", StringType),
    StructField("mood", StringType)))
}

/** Canonical label vocabularies.
  *
  * Weather labels: reference weather_producer.py:17-40 (22 coded labels +
  * "unknown" fallback). Mood sets: reference jobs/spark_mood_tracker.py:81-90.
  */
object Vocab {

  /** Open-Meteo weathercode → canonical label (weather_producer.py:17-40);
    * unmapped codes → "unknown". This is the engine's canonical weather
    * vocabulary source.
    */
  val WeatherCodeMap: Map[Int, String] = Map(
    0 -> "clear", 1 -> "mainly_clear", 2 -> "partly_cloudy", 3 -> "overcast",
    45 -> "fog", 48 -> "depositing_rime_fog",
    51 -> "drizzle_light", 53 -> "drizzle_moderate", 55 -> "drizzle_dense",
    61 -> "rain_slight", 63 -> "rain_moderate", 65 -> "rain_heavy",
    71 -> "snow_slight", 73 -> "snow_moderate", 75 -> "snow_heavy",
    80 -> "rain_showers_slight", 81 -> "rain_showers_moderate",
    82 -> "rain_showers_heavy",
    85 -> "snow_showers_slight", 86 -> "snow_showers_heavy",
    95 -> "thunderstorm", 96 -> "thunderstorm_with_hail")

  def weatherLabel(code: Int): String = WeatherCodeMap.getOrElse(code, "unknown")

  val RelaxingWeather: Seq[String] =
    Seq("clear", "mainly_clear", "partly_cloudy")

  val StressfulWeather: Seq[String] = Seq(
    "overcast", "fog", "depositing_rime_fog",
    "drizzle_light", "drizzle_moderate", "drizzle_dense",
    "rain_slight", "rain_moderate", "rain_heavy",
    "rain_showers_slight", "rain_showers_moderate", "rain_showers_heavy",
    "snow_slight", "snow_moderate", "snow_heavy",
    "snow_showers_slight", "snow_showers_heavy",
    "thunderstorm", "thunderstorm_with_hail")

  val AllWeather: Seq[String] =
    RelaxingWeather ++ StressfulWeather :+ "unknown"

  /** Output vocabulary of the mood classifier (jobs/spark_mood_tracker.py:93-108). */
  val Moods: Seq[String] = Seq(
    "unknown", "tense", "relaxed", "stressed",
    "slowed_but_chill", "fast_but_gloomy", "normal")

  /** News keyword lists (jobs/spark_news_consumer.py:27-34); negative checked first. */
  val NegativeNews: Seq[String] =
    Seq("accident", "strike", "crash", "delay", "protest")
  val PositiveNews: Seq[String] =
    Seq("smooth", "sunny", "festival", "celebration")

  val Sentiments: Seq[String] = Seq("negative", "positive", "neutral")

  /** The BACKFILL writer's sentiment→mood map (fake_mood_backfill.py:17-21)
    * — a second, drifted mood vocabulary sharing the `mood_events` table
    * with the stream's 7-label classifier output (SURVEY §1.3). Kept
    * centralized here; ingestion accepts the union (`AllMoods`).
    */
  val BackfillMoodMap: Map[String, String] = Map(
    "positive" -> "happy", "neutral" -> "neutral", "negative" -> "stressed")

  /** Union mood vocabulary: every label either writer may produce. */
  val AllMoods: Seq[String] = (Moods ++ BackfillMoodMap.values).distinct
}
