package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

import graft.io.BatchSink
import graft.pipeline.ExportPipeline

class ExportPipelineSpec extends SparkSpec {
  import spark.implicits._

  private class CollectSink extends BatchSink {
    val rows = ArrayBuffer.empty[org.apache.spark.sql.Row]
    def write(df: DataFrame): Unit = { rows ++= df.collect(); () }
  }

  test("export: corrupt + invalid rows dropped, counts from one cached read") {
    val raw = Seq(
      // valid (the reference's canonical komitas fixture)
      ("2025-04-19 16:10:00", "komitas", 42.0, "clear", null: String),
      // negative speed → invalid
      ("2025-04-19 16:11:00", "komitas", -5.0, "clear", null: String),
      // null weather → invalid
      ("2025-04-19 16:12:00", "komitas", 42.0, null: String, null: String),
      // corrupt source line
      ("2025-04-19 16:13:00", "komitas", 42.0, "clear", "raw garbage")
    ).toDF("event_time", "intersection", "avg_speed", "weather", "_corrupt_record")
    val sink = new CollectSink
    val res = ExportPipeline.run(raw, sink)
    assert(res.read == 3) // corrupt dropped before the read-count
    assert(res.valid == 1 && res.written == 1)
    assert(sink.rows.map(_.getAs[String]("intersection")).toSeq == Seq("komitas"))
    assert(sink.rows.head.getAs[java.sql.Timestamp]("event_time") ==
      java.sql.Timestamp.valueOf("2025-04-19 16:10:00"))
  }

  test("export: empty input fails the quality gate") {
    val raw = Seq.empty[(String, String, Double, String)]
      .toDF("event_time", "intersection", "avg_speed", "weather")
    val sink = new CollectSink
    intercept[IllegalArgumentException] {
      ExportPipeline.run(raw, sink)
    }
  }
}
