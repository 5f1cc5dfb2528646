package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.TrafficEvent
import graft.streaming.MinuteAgg

/** Update-mode watermark semantics for the production minute aggregation:
  * changed-rows-only emission, same-key re-emission across micro-batches,
  * and late-row drop once the watermark passes the minute.
  */
class MinuteAggUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Some(Timestamp.valueOf(s))
  private def m(s: String) = Timestamp.valueOf(s)

  test("update mode re-emits changed minutes and drops watermark-late rows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TrafficEvent]

    // upsert sink: merge each batch's changed rows by (minute, key), and
    // keep per-batch emission logs so we can assert WHAT each batch changed
    val table = mutable.Map.empty[(Timestamp, String), (Long, Double)]
    val batches = mutable.ArrayBuffer.empty[Seq[(Timestamp, String, Long)]]
    val writer = MinuteAgg.updateMinuteCounts(
      in.toDF(), "timestamp", "intersection", "speed") {
      (batch: DataFrame, _: Long) =>
        val rows = batch.collect().map { r =>
          val key = (r.getAs[Timestamp]("minute"), r.getAs[String]("intersection"))
          table(key) = (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))
          (key._1, key._2, r.getAs[Long]("n_events"))
        }.toSeq
        if (rows.nonEmpty) batches += rows
        ()
    }
    val q = writer
      .option("checkpointLocation",
        tmpDir("minagg-ckpt"))
      .start()
    try {
      // batch 1: two rows in minute 10:00 → one changed row (n=2)
      in.addData(
        TrafficEvent("a", "v1", Some(10.0), ts("2025-04-19 10:00:10")),
        TrafficEvent("a", "v2", Some(20.0), ts("2025-04-19 10:00:40")))
      q.processAllAvailable()
      assert(table(m("2025-04-19 10:00:00") -> "a") == ((2L, 30.0)))

      // batch 2: minute 10:10 opens; advances the watermark to ~10:09
      in.addData(TrafficEvent("a", "v3", Some(5.0), ts("2025-04-19 10:10:00")))
      q.processAllAvailable()
      assert(table(m("2025-04-19 10:10:00") -> "a") == ((1L, 5.0)))

      // batch 3: a LATE row for the closed minute 10:00 (behind the
      // watermark → dropped by state, never re-emitted) plus an in-window
      // row updating the open minute 10:10 (update-mode re-emission)
      in.addData(
        TrafficEvent("a", "v4", Some(99.0), ts("2025-04-19 10:00:50")),
        TrafficEvent("a", "v5", Some(15.0), ts("2025-04-19 10:10:20")))
      q.processAllAvailable()

      // the closed minute kept its pre-late value — the late row vanished
      assert(table(m("2025-04-19 10:00:00") -> "a") == ((2L, 30.0)))
      // the open minute was re-emitted with the merged aggregate
      assert(table(m("2025-04-19 10:10:00") -> "a") == ((2L, 20.0)))
      // per-batch emission log: batch 3 changed ONLY minute 10:10 — update
      // mode emits changed rows, never the whole table (the complete-mode
      // gate variant would re-emit every minute here)
      val last = batches.last
      assert(last.map(r => (r._1, r._2)).toSet == Set(m("2025-04-19 10:10:00") -> "a"),
        s"batch 3 should touch only the open minute: $last")
      assert(batches.forall(_.forall(_._2 == "a")))
    } finally q.stop()
  }
}
