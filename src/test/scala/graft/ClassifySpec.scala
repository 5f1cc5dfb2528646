package graft

import org.apache.spark.sql.functions._

import graft.model.Vocab
import graft.ops.Classify

/** Truth-table tests for the native CaseWhen classifiers — semantics from
  * reference jobs/spark_mood_tracker.py:93-108 (U1) and
  * jobs/spark_news_consumer.py:27-34 (U2).
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def mood(speed: Option[Double], weather: Option[String], senti: Option[String]): String = {
    val df = Seq((speed, weather, senti)).toDF("avg_speed", "weather", "sentiment")
    df.select(Classify.moodLabel(col("avg_speed"), col("weather"), col("sentiment")).as("m"))
      .head().getString(0)
  }

  test("null speed or weather → unknown (null sentiment alone does not)") {
    assert(mood(None, Some("clear"), Some("neutral")) == "unknown")
    assert(mood(Some(50), None, Some("neutral")) == "unknown")
    assert(mood(None, None, None) == "unknown")
    assert(mood(Some(45), Some("clear"), None) == "normal")
  }

  test("negative sentiment → tense (beats speed/weather rules)") {
    assert(mood(Some(80), Some("clear"), Some("negative")) == "tense")
    assert(mood(Some(10), Some("thunderstorm"), Some("negative")) == "tense")
  }

  test("speed/weather quadrants") {
    assert(mood(Some(70), Some("clear"), Some("neutral")) == "relaxed")
    assert(mood(Some(20), Some("rain_heavy"), Some("neutral")) == "stressed")
    assert(mood(Some(20), Some("partly_cloudy"), Some("neutral")) == "slowed_but_chill")
    assert(mood(Some(70), Some("fog"), Some("neutral")) == "fast_but_gloomy")
  }

  test("boundary speeds 30..60 → normal; weather 'unknown' → normal path") {
    assert(mood(Some(30), Some("clear"), Some("neutral")) == "normal")
    assert(mood(Some(60), Some("clear"), Some("neutral")) == "normal")
    assert(mood(Some(45), Some("rain_heavy"), Some("positive")) == "normal")
    assert(mood(Some(70), Some("unknown"), Some("neutral")) == "normal")
    assert(mood(Some(20), Some("unknown"), Some("neutral")) == "normal")
  }

  test("mood output always within the 7-label vocabulary") {
    val speeds = Seq(None, Some(10.0), Some(30.0), Some(45.0), Some(60.0), Some(80.0))
    val weathers = None +: (Vocab.AllWeather.map(Some(_)))
    val sentis = Seq(None, Some("negative"), Some("positive"), Some("neutral"))
    val rows = for { s <- speeds; w <- weathers; n <- sentis } yield (s, w, n)
    val df = rows.toDF("avg_speed", "weather", "sentiment")
      .select(Classify.moodLabel(col("avg_speed"), col("weather"), col("sentiment")).as("m"))
    val out = df.distinct().collect().map(_.getString(0)).toSet
    assert(out.subsetOf(Vocab.Moods.toSet))
  }

  private def senti(headline: Option[String]): String =
    Seq(Tuple1(headline)).toDF("headline")
      .select(Classify.newsSentiment(col("headline")).as("s"))
      .head().getString(0)

  test("news keywords: negative beats positive; null → neutral (documented divergence)") {
    assert(senti(Some("Accident near the festival")) == "negative")
    assert(senti(Some("Sunny celebration downtown")) == "positive")
    assert(senti(Some("STRIKE announced")) == "negative")
    assert(senti(Some("nothing happened")) == "neutral")
    assert(senti(None) == "neutral")
  }

  test("traffic buckets: <30 heavy, <60 moderate, else light; null → light") {
    val df = Seq(Some(10.0), Some(29.99), Some(30.0), Some(59.9), Some(60.0), Some(90.0), None)
      .toDF("speed")
      .select(col("speed"), Classify.trafficCondition(col("speed")).as("b"))
    val got = df.collect().map(r => (Option(r.get(0)), r.getString(1)))
    val expected = Seq(
      Some(10.0) -> "heavy", Some(29.99) -> "heavy",
      Some(30.0) -> "moderate", Some(59.9) -> "moderate",
      Some(60.0) -> "light", Some(90.0) -> "light",
      None -> "light")
    assert(got.toSeq == expected.map { case (k, v) => (k: Option[Any], v) })
  }
}
