package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.MoodPipeline

/** End-to-end golden test of the flagship dataflow on hand-built fixtures
  * (FIXTURES.md §1/§2 — the reference's canonical komitas record among them).
  */
class MoodPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mood pipeline: aggregate → align → classify on golden fixtures") {
    // minute 16:10 — komitas, fast + clear + positive → relaxed
    // minute 16:11 — mashtots, slow + rain + neutral → stressed
    // minute 16:12 — tumanyan, traffic but NO weather row → unknown (left join)
    val traffic = Seq(
      ("komitas", "veh-1", 80.0, "2025-04-19 16:10:10"),
      ("komitas", "veh-2", 88.0, "2025-04-19 16:10:40"),
      ("mashtots", "veh-3", 20.0, "2025-04-19 16:11:05"),
      ("tumanyan", "veh-4", 50.0, "2025-04-19 16:12:30")
    ).toDF("intersection", "vehicle_id", "speed", "timestamp")
    val weather = Seq(
      (1L, "2025-04-19 16:10:20", 15.0, "clear"),
      (2L, "2025-04-19 16:11:20", 14.0, "rain_heavy")
    ).toDF("arrival", "timestamp", "temp", "weather")
    val news = Seq(
      (1L, "2025-04-19 16:10:30", "positive"),
      (2L, "2025-04-19 16:11:30", "neutral")
    ).toDF("arrival", "timestamp", "sentiment")

    val got = MoodPipeline.run(traffic, weather, news, arrivalCol = "arrival")
      .orderBy("event_time", "intersection")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)).orNull, Option(r.get(5)).orNull, r.getString(6)))

    assert(got.toSeq == Seq(
      (ts("2025-04-19 16:10:00"), "komitas", 84.0, Some(15.0), "clear", "positive", "relaxed"),
      (ts("2025-04-19 16:11:00"), "mashtots", 20.0, Some(14.0), "rain_heavy", "neutral", "stressed"),
      (ts("2025-04-19 16:12:00"), "tumanyan", 50.0, None, null, null, "unknown")))
  }

  test("deterministic first: min_by on arrival key picks earliest row per minute") {
    val weather = Seq(
      (5L, "2025-04-19 16:10:50", 20.0, "fog"),
      (1L, "2025-04-19 16:10:10", 10.0, "clear")
    ).toDF("arrival", "timestamp", "temp", "weather")
    val agg = graft.ops.Aggregates.weatherPerMinute(
      MoodPipeline.withEventTime(weather), arrivalCol = "arrival")
    val row = agg.head()
    assert(row.getAs[String]("weather") == "clear") // arrival 1 wins
    assert(row.getAs[Double]("avg_temp") == 15.0)
  }

  test("daily summary groups flagship output per (intersection, mood)") {
    val mood = Seq(
      ("komitas", "relaxed", 80.0, 15.0),
      ("komitas", "relaxed", 90.0, 17.0),
      ("mashtots", "stressed", 20.0, 14.0)
    ).toDF("intersection", "mood", "avg_speed", "avg_temp")
    val got = graft.ops.Aggregates.dailySummary(mood)
      .orderBy("intersection", "mood").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("komitas", "relaxed", 2L, 85.0, 16.0),
      ("mashtots", "stressed", 1L, 20.0, 14.0)))
  }
}
