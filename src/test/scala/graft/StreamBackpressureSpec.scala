package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}

import graft.io.JsonFileSource
import graft.streaming.MinuteAgg

/** Backpressure semantics: the minute-agg chain must produce the SAME
  * final table whether a backlog is swallowed in one micro-batch or
  * drained one file at a time (`maxFilesPerTrigger=1`) — the
  * restart-against-backlog scenario a real deployment hits first. The
  * per-batch outputs legitimately differ (update mode emits what each
  * batch changed); it is the upserted RESULT that must be invariant.
  */
class StreamBackpressureSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("key", StringType),
    StructField("value", DoubleType)))

  // six single-event files across two minutes, in event-time order (an
  // in-order backlog: throttling must not drop anything as late)
  private val events = Seq(
    ("2025-04-19 16:10:05", "a", 1.0),
    ("2025-04-19 16:10:15", "a", 2.0),
    ("2025-04-19 16:10:25", "b", 4.0),
    ("2025-04-19 16:11:05", "a", 8.0),
    ("2025-04-19 16:11:15", "b", 16.0),
    ("2025-04-19 16:11:25", "b", 32.0))

  private def writeBacklog(): String = {
    val dir = tmpDir("graft_backlog")
    events.zipWithIndex.foreach { case ((t, k, v), i) =>
      Files.write(Paths.get(dir, f"ev_$i%03d.json"),
        s"""{"ts":"$t","key":"$k","value":$v}""".getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  /** Drain the backlog through MinuteAgg, upserting each update batch into
    * a map; returns (final table, number of non-empty update batches).
    */
  private def run(dir: String, maxFiles: Option[Int]): (Map[(Timestamp, String), (Long, Double)], Int) = {
    val stream = new JsonFileSource(dir, maxFiles).stream(spark, schema)
    val acc = mutable.Map.empty[(Timestamp, String), (Long, Double)]
    var nonEmptyBatches = 0
    val q = MinuteAgg.updateMinuteCounts(stream, "ts", "key", "value") { (batch, _) =>
      val rows = batch.collect()
      if (rows.nonEmpty) nonEmptyBatches += 1
      rows.foreach { r =>
        acc((r.getAs[Timestamp]("minute"), r.getAs[String]("key"))) =
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))
      }
    }
      .option("checkpointLocation", tmpDir("graft_backlog_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    (acc.toMap, nonEmptyBatches)
  }

  test("minute agg: identical final table under 1-file micro-batches vs one gulp") {
    val dir = writeBacklog()
    val (bulk, bulkBatches) = run(dir, None)
    val (throttled, throttledBatches) = run(dir, Some(1))

    val expected = Map(
      (Timestamp.valueOf("2025-04-19 16:10:00"), "a") -> (2L, 3.0),
      (Timestamp.valueOf("2025-04-19 16:10:00"), "b") -> (1L, 4.0),
      (Timestamp.valueOf("2025-04-19 16:11:00"), "a") -> (1L, 8.0),
      (Timestamp.valueOf("2025-04-19 16:11:00"), "b") -> (2L, 48.0))
    assert(bulk == expected)
    assert(throttled == expected, "throttled drain diverged from the one-gulp result")

    // the knob actually throttled: six files -> at least six update batches,
    // while the unthrottled AvailableNow run took the backlog in one
    assert(throttledBatches >= events.size,
      s"expected >=${events.size} 1-file batches, saw $throttledBatches")
    assert(bulkBatches == 1, s"unthrottled run split unexpectedly: $bulkBatches")
  }
}
