package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.model.Vocab
import graft.ops.Classify

/** Property tests (SURVEY.md §5): classifier totality and invariants over
  * randomized inputs, evaluated through the real Catalyst expressions.
  */
class ClassifyPropertySpec extends SparkSpec {
  import spark.implicits._

  private val speedGen: Gen[Option[Double]] =
    Gen.option(Gen.chooseNum(-10.0, 150.0))
  private val weatherGen: Gen[Option[String]] =
    Gen.option(Gen.oneOf(Vocab.AllWeather :+ "martian_dust"))
  private val sentiGen: Gen[Option[String]] =
    Gen.option(Gen.oneOf("negative", "positive", "neutral", "odd"))

  test("moodLabel is total: never null, always within the 7-label vocabulary") {
    // evaluate a batch of random triples in ONE Spark job (per-case jobs
    // would make the property test minutes-slow)
    val cases = Gen.listOfN(300, Gen.zip(speedGen, weatherGen, sentiGen))
      .sample.getOrElse(Nil)
    val rows = cases.toDF("avg_speed", "weather", "sentiment")
      .select(Classify.moodLabel(col("avg_speed"), col("weather"), col("sentiment")).as("m"))
      .collect()
    assert(rows.length == cases.length)
    rows.foreach { r =>
      val m = r.getString(0)
      assert(m != null && Vocab.Moods.contains(m), s"bad label: $m")
    }
  }

  test("moodLabel invariants: null speed/weather → unknown; negative wins; bounds") {
    val cases = Gen.listOfN(300, Gen.zip(speedGen, weatherGen, sentiGen))
      .sample.getOrElse(Nil)
    val got = cases.toDF("avg_speed", "weather", "sentiment")
      .select(col("avg_speed"), col("weather"), col("sentiment"),
        Classify.moodLabel(col("avg_speed"), col("weather"), col("sentiment")).as("m"))
      .collect()
    got.foreach { r =>
      val speed = Option(r.get(0)).map(_.asInstanceOf[Double])
      val weather = Option(r.get(1)).map(_.asInstanceOf[String])
      val senti = Option(r.get(2)).map(_.asInstanceOf[String])
      val m = r.getString(3)
      if (speed.isEmpty || weather.isEmpty) assert(m == "unknown")
      else if (senti.contains("negative")) assert(m == "tense")
      else if (speed.exists(s => s >= 30 && s <= 60)) assert(m == "normal")
      else {
        val relaxing = Vocab.RelaxingWeather.contains(weather.get)
        val stressful = Vocab.StressfulWeather.contains(weather.get)
        if (!relaxing && !stressful) assert(m == "normal") // unknown/alien weather
      }
    }
  }

  test("newsSentiment precedence: any negative keyword beats any positive keyword") {
    val negGen = Gen.oneOf(Vocab.NegativeNews)
    val posGen = Gen.oneOf(Vocab.PositiveNews)
    val pairs = Gen.listOfN(50, Gen.zip(negGen, posGen)).sample.getOrElse(Nil)
    val got = pairs.map { case (n, p) => s"the $p $n report" }.toDF("headline")
      .select(Classify.newsSentiment(col("headline")).as("s")).collect()
    got.foreach(r => assert(r.getString(0) == "negative"))
  }
}
