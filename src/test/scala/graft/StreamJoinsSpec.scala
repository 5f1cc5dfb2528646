package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoins

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  private def t(s: String) = Timestamp.valueOf(s)
  private def tmp(p: String) = tmpDir(p)

  test("stream-stream interval join matches clicks within the window, across batches") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamJoins.purchasesWithRecentClicks(
      clicks.toDF(), purchases.toDF(), windowMinutes = 30)
    val q = joined.writeStream
      .format("memory").queryName("ssj")
      .option("checkpointLocation", tmp("ssj-ckpt"))
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: clicks only — nothing can emit yet
      clicks.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1.0),
        Ev(1, t("2024-01-01 10:20:00"), 2.0),
        Ev(2, t("2024-01-01 10:00:00"), 9.0))
      q.processAllAvailable()
      // batch 2: purchases — match must span micro-batches (join state)
      purchases.addData(
        Ev(1, t("2024-01-01 10:30:00"), 100.0), // both clicks in window
        Ev(2, t("2024-01-01 11:00:00"), 200.0)) // user 2's click too old (> 30m)
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select("user_id", "click_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(got == Seq((1L, 1.0), (1L, 2.0)))
    } finally q.stop()
  }

  test("interval join restarted on the same checkpoint keeps join state, no double emits") {
    implicit val ctx = spark.sqlContext
    val ckpt = tmp("ssj-rec-ckpt")
    val outDir = tmp("ssj-rec-out")
    val inDir = tmp("ssj-rec-in")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType), StructField("kind", StringType)))
    def writeInput(rows: (Long, String, Double, String)*): Unit =
      rows.toSeq.map { case (u, s, v, k) => (u, t(s), v, k) }
        .toDF("user_id", "ts", "value", "kind")
        .write.mode("append").parquet(inDir)
    def startQuery() = {
      val in = spark.readStream.schema(schema).parquet(inDir)
      StreamJoins.purchasesWithRecentClicks(
          in.filter($"kind" === "c").drop("kind"),
          in.filter($"kind" === "p").drop("kind"), windowMinutes = 30)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }
    // run 1: a click arrives; its purchase hasn't yet
    writeInput((1L, "2024-01-01 10:00:00", 1.0, "c"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // run 2, SAME checkpoint: the matching purchase arrives — the click must
    // still be in restored join state
    writeInput((1L, "2024-01-01 10:10:00", 100.0, "p"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir)
      .select("user_id", "click_value", "purchase_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 1.0, 100.0))) // exactly once, across the restart
  }

  test("streaming dedup suppresses same-key events within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val deduped = StreamJoins.dedupeEvents(in.toDF(), Seq("user_id"), "ts", "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup")
      .option("checkpointLocation", tmp("sdedup-ckpt"))
      .outputMode(OutputMode.Append)
      .start()
    try {
      in.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1.0),
        Ev(1, t("2024-01-01 10:05:00"), 2.0), // dup key within watermark
        Ev(2, t("2024-01-01 10:00:00"), 3.0))
      q.processAllAvailable()
      in.addData(Ev(1, t("2024-01-01 10:06:00"), 4.0)) // still within watermark
      q.processAllAvailable()
      val got = spark.table("sdedup").select("user_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L)) // one row per key
    } finally q.stop()
  }
}
