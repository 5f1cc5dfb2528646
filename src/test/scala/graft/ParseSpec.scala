package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.{Parse, Validate}

class ParseSpec extends SparkSpec {
  import spark.implicits._

  test("ingest: binary value → JSON parse → flattened columns (P1–P3)") {
    val raw = Seq(
      """{"intersection":"komitas","vehicle_id":"veh-1","speed":42.5,"timestamp":"2025-04-19 16:10:00"}""",
      """{"intersection":"mashtots","speed":"not-a-number","timestamp":"2025-04-19 16:11:00"}""",
      """not json at all"""
    ).toDF("s").select($"s".cast("binary").as("value"))
    val got = Parse.ingest(raw, Schemas.traffic).collect()
    assert(got.length == 3)
    val ok = got.head
    assert(ok.getAs[String]("intersection") == "komitas")
    assert(ok.getAs[Double]("speed") == 42.5)
    // malformed field → null, not error (PERMISSIVE)
    assert(got(1).getAs[Any]("speed") == null)
    assert(got(1).getAs[String]("intersection") == "mashtots")
    // whole-row garbage → all-null row
    assert(got(2).getAs[String]("intersection") == null)
  }

  test("dropCorrupt removes rows flagged by a corrupt-record column (P7)") {
    val df = Seq(("a", null: String), ("b", "boom")).toDF("x", "_corrupt_record")
    assert(Parse.dropCorrupt(df).collect().map(_.getString(0)).toSeq == Seq("a"))
    val clean = Seq(Tuple1("a")).toDF("x")
    assert(Parse.dropCorrupt(clean).columns.toSeq == Seq("x")) // no-op without the col
  }

  test("validMood keeps only complete positive-speed rows (P8)") {
    val df = Seq(
      (Some("2025-04-19 16:10:00"), Some("komitas"), Some("clear"), Some(42.0)),
      (None, Some("komitas"), Some("clear"), Some(42.0)),
      (Some("2025-04-19 16:10:00"), Some("komitas"), Some("clear"), Some(-1.0)),
      (Some("2025-04-19 16:10:00"), Some("komitas"), None, Some(42.0))
    ).toDF("event_time", "intersection", "weather", "avg_speed")
    assert(Validate.validMood(df).count() == 1)
  }

  test("missingRequired finds rows with any null required column (A6)") {
    val df = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("x", "y")
    assert(Validate.missingRequired(df, Seq("x", "y")).count() == 2)
  }
}
