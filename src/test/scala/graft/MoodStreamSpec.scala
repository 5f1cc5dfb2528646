package graft

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.{NewsEvent, TrafficEvent, WeatherEvent}
import graft.streaming.MoodStream

/** Streaming semantics of the flagship pipeline under MemoryStream —
  * watermark progression, append-mode emission, and the multi-stateful
  * agg→join chain (SURVEY.md §7 risk #1).
  */
class MoodStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Some(Timestamp.valueOf(s))

  test("full streaming chain: 3 watermarked aggs → 2 left joins → classify (append)") {
    implicit val ctx = spark.sqlContext
    val traffic = MemoryStream[TrafficEvent]
    val weather = MemoryStream[WeatherEvent]
    val news = MemoryStream[NewsEvent]

    val classified = MoodStream.aggregatedJoined(
      traffic.toDF(), weather.toDF(), news.toDF())

    val q = classified.writeStream
      .format("memory").queryName("mood_chain")
      .option("checkpointLocation", tmpDir("chain-ckpt"))
      .outputMode(OutputMode.Append)
      .start()
    try {
      traffic.addData(
        TrafficEvent("komitas", "veh-1", Some(80.0), ts("2025-04-19 16:10:10")),
        TrafficEvent("komitas", "veh-2", Some(90.0), ts("2025-04-19 16:10:40")))
      weather.addData(WeatherEvent(ts("2025-04-19 16:10:20"), Some(15.0), Some(3.0), "clear"))
      news.addData(NewsEvent(ts("2025-04-19 16:10:30"), "Sunny festival", "positive"))
      q.processAllAvailable()

      // advance event time far enough for the watermark to close minute 16:10
      // through every stateful operator in the chain (each op applies the
      // watermark with one micro-batch of lag)
      var minute = 20
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && minute < 28) {
        traffic.addData(TrafficEvent("komitas", "veh-9", Some(50.0),
          ts(f"2025-04-19 16:$minute%02d:00")))
        weather.addData(WeatherEvent(ts(f"2025-04-19 16:$minute%02d:00"),
          Some(10.0), Some(1.0), "fog"))
        news.addData(NewsEvent(ts(f"2025-04-19 16:$minute%02d:00"), "x", "neutral"))
        q.processAllAvailable()
        rows = spark.table("mood_chain")
          .filter($"event_time" === Timestamp.valueOf("2025-04-19 16:10:00"))
          .collect()
        minute += 2
      }
      assert(rows.nonEmpty, "minute 16:10 never emitted from the streaming chain")
      val r = rows.head
      assert(r.getAs[String]("intersection") == "komitas")
      assert(r.getAs[Double]("avg_speed") == 85.0)
      assert(r.getAs[String]("weather") == "clear")
      assert(r.getAs[String]("mood") == "relaxed")
    } finally q.stop()
  }

  test("left-outer null emission: traffic-only minute emits mood='unknown' " +
    "after watermark close (Trigger.AvailableNow)") {
    implicit val ctx = spark.sqlContext
    val traffic = MemoryStream[TrafficEvent]
    val weather = MemoryStream[WeatherEvent]
    val news = MemoryStream[NewsEvent]

    val classified = MoodStream.aggregatedJoined(
      traffic.toDF(), weather.toDF(), news.toDF())
    val ckpt = tmpDir("lo-ckpt")
    val out = tmpDir("lo-out")

    // the probe minute gets ONLY traffic — weather/news never cover 16:10,
    // so its row can only come from the join's null-padded left-outer side
    traffic.addData(
      TrafficEvent("baghramyan", "veh-1", Some(42.0), ts("2025-04-19 16:10:15")))

    // each AvailableNow run drains everything added so far, commits the
    // watermark into the checkpoint, and terminates; the next run resumes
    // from it (file sinks support recovery; memory sinks don't) — null
    // emission needs a batch where the watermark has passed the join
    // window, hence the restart loop
    def runOnce(): Unit = {
      val q = MoodStream.startToParquet(classified, out, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    def emitted(): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(out)
        .filter($"event_time" === Timestamp.valueOf("2025-04-19 16:10:00"))
        .collect()
    runOnce()

    var minute = 20
    var rows = Array.empty[org.apache.spark.sql.Row]
    while (rows.isEmpty && minute < 34) {
      traffic.addData(TrafficEvent("baghramyan", "veh-9", Some(50.0),
        ts(f"2025-04-19 16:$minute%02d:00")))
      weather.addData(WeatherEvent(ts(f"2025-04-19 16:$minute%02d:00"),
        Some(10.0), Some(1.0), "fog"))
      news.addData(NewsEvent(ts(f"2025-04-19 16:$minute%02d:00"), "x", "neutral"))
      runOnce()
      rows = emitted()
      minute += 2
    }
    assert(rows.nonEmpty,
      "traffic-only minute 16:10 never null-emitted from the left-outer chain")
    val r = rows.head
    assert(r.getAs[String]("intersection") == "baghramyan")
    assert(r.getAs[Double]("avg_speed") == 42.0)
    assert(r.isNullAt(r.fieldIndex("avg_temp")), "weather side must be null-padded")
    assert(r.isNullAt(r.fieldIndex("weather")))
    assert(r.isNullAt(r.fieldIndex("sentiment")), "news side must be null-padded")
    assert(r.getAs[String]("mood") == "unknown")
  }

  test("foreachBatch fallback: batch-join alignment per micro-batch") {
    implicit val ctx = spark.sqlContext
    val traffic = MemoryStream[TrafficEvent]
    val weather = MemoryStream[WeatherEvent]
    val news = MemoryStream[NewsEvent]

    val collected = ArrayBuffer.empty[(Timestamp, String, Double, String, String)]
    val writer = MoodStream.foreachBatchAligned(
      traffic.toDF(), weather.toDF(), news.toDF(), tmpDir("fb-ckpt")) {
      (aligned: DataFrame, _: Long) =>
        collected ++= aligned.collect().map(r => (
          r.getAs[Timestamp]("event_time"), r.getAs[String]("intersection"),
          r.getAs[Double]("avg_speed"), r.getAs[String]("weather"),
          r.getAs[String]("mood")))
        ()
    }
    val q = writer.start()
    try {
      traffic.addData(
        TrafficEvent("mashtots", "veh-1", Some(20.0), ts("2025-04-19 16:10:10")))
      weather.addData(WeatherEvent(ts("2025-04-19 16:10:20"), Some(14.0), Some(3.0), "rain_heavy"))
      news.addData(NewsEvent(ts("2025-04-19 16:10:30"), "x", "neutral"))
      q.processAllAvailable()
      // the query watermark is the MIN across all three inputs — every
      // stream must advance for minute 16:10 to close
      var minute = 20
      while (collected.isEmpty && minute < 28) {
        traffic.addData(TrafficEvent("mashtots", "veh-9", Some(50.0),
          ts(f"2025-04-19 16:$minute%02d:00")))
        weather.addData(WeatherEvent(ts(f"2025-04-19 16:$minute%02d:00"),
          Some(10.0), Some(1.0), "fog"))
        news.addData(NewsEvent(ts(f"2025-04-19 16:$minute%02d:00"), "x", "neutral"))
        q.processAllAvailable()
        minute += 2
      }
      assert(collected.nonEmpty, "no aligned batch emitted")
      val row = collected.find(_._1 == Timestamp.valueOf("2025-04-19 16:10:00"))
      assert(row.isDefined)
      assert(row.get == ((Timestamp.valueOf("2025-04-19 16:10:00"), "mashtots",
        20.0, "rain_heavy", "stressed")))
    } finally q.stop()
  }
}
