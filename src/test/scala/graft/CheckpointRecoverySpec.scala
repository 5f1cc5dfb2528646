package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Restart-from-checkpoint semantics: a streaming aggregation stopped and
  * restarted on the SAME checkpoint resumes from committed offsets and
  * restored state — no double emission, and a minute whose events span the
  * restart aggregates correctly. (The reference configures no checkpoints
  * and silently loses state on restart — BASELINE.md.)
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming agg restarted on the same checkpoint resumes state exactly once") {
    val ckpt = tmpDir("recovery-ckpt")
    val outDir = tmpDir("recovery-out")
    val inDir = tmpDir("recovery-in")

    def writeInput(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("intersection", "speed", "t")
        .select(col("intersection"), col("speed"), to_timestamp(col("t")).as("timestamp"))
        .write.mode("append").parquet(inDir)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("intersection",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("speed",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("timestamp",
        org.apache.spark.sql.types.TimestampType)))

    def startQuery() =
      spark.readStream.schema(schema).parquet(inDir)
        .withColumn("event_time", date_trunc("minute", col("timestamp")))
        .withWatermark("event_time", "1 minute")
        .groupBy(col("event_time"), col("intersection"))
        .agg(count(lit(1)).as("n"), sum(col("speed")).as("sum_speed"))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()

    // run 1: two events in minute 10:00, one in 10:05 (stays in state)
    writeInput(("komitas", 10.0, "2024-01-01 10:00:10"),
      ("komitas", 20.0, "2024-01-01 10:00:40"),
      ("komitas", 30.0, "2024-01-01 10:05:00"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // run 2 on the SAME checkpoint: one more event in 10:05 (merges with
    // restored state), then a late-minute event to close everything
    writeInput(("komitas", 40.0, "2024-01-01 10:05:30"))
    writeInput(("komitas", 50.0, "2024-01-01 10:20:00"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Timestamp]("event_time"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_speed")))
    // minute 10:00 exactly once, not re-emitted after restart
    assert(rows.count(_._1 == ts("2024-01-01 10:00:00")) == 1)
    assert(rows.find(_._1 == ts("2024-01-01 10:00:00")).get == ((ts("2024-01-01 10:00:00"), 2L, 30.0)))
    // minute 10:05 spans the restart: state restored, both events counted
    assert(rows.find(_._1 == ts("2024-01-01 10:05:00")).map(r => (r._2, r._3)) ==
      Some((2L, 70.0)))
  }
}
