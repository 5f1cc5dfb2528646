package graft

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.{BatchSink, KafkaEventSource, Sinks}
import graft.model.{NewsEvent, Schemas}

/** The reference's news consumer starts TWO independent queries from one
  * lineage — console debug plus the real sink
  * (jobs/spark_news_consumer.py:39-43 and :54-58) — which double-reads the
  * Kafka topic: each query tracks its own offsets and re-pulls every
  * record. This spec pins that two-queries-one-lineage shape (both sinks
  * drain the same rows) so the engine demonstrably supports the
  * reference's deployment layout, while the scaladoc on [[Sinks.console]]
  * steers production to one foreachBatch doing both writes when the
  * double read matters.
  */
class NewsDualSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Some(Timestamp.valueOf(s))

  test("console + foreachBatch queries from ONE lineage both drain the same rows") {
    implicit val ctx = spark.sqlContext
    val news = MemoryStream[NewsEvent]
    // one lineage: parse + classify once, exactly as the reference builds
    // `classified` once and hands it to both writeStream calls
    val classified = news.toDF()
      .select(col("timestamp"), col("headline"),
        graft.ops.Classify.newsSentiment(col("headline")).as("sentiment"))

    val seen = ArrayBuffer.empty[(String, String)]
    val collector = new BatchSink {
      def write(df: DataFrame): Unit = seen.synchronized {
        seen ++= df.collect().map(r =>
          (r.getAs[String]("headline"), r.getAs[String]("sentiment")))
      }
    }
    val qConsole = Sinks.console(classified)
      .option("checkpointLocation", tmpDir("news-console-ckpt"))
      .start()
    val qSink = Sinks.streamInto(classified, collector, tmpDir("news-sink-ckpt"))
      .start()
    try {
      news.addData(
        NewsEvent(ts("2025-04-19 16:10:00"), "Sunny festival opens", "positive"),
        NewsEvent(ts("2025-04-19 16:11:00"), "Crash closes avenue", "negative"))
      qConsole.processAllAvailable()
      qSink.processAllAvailable()
      // the real sink received both classified rows
      assert(seen.sortBy(_._1).toSeq == Seq(
        ("Crash closes avenue", "negative"),
        ("Sunny festival opens", "positive")))
      // the console query independently consumed the SAME two records —
      // the double-read cost the reference shape carries (each query has
      // its own offset log)
      assert(qConsole.recentProgress.map(_.numInputRows).sum == 2L)
      assert(qSink.recentProgress.map(_.numInputRows).sum == 2L)
    } finally {
      qConsole.stop(); qSink.stop()
    }
  }

  /** Live-broker smoke (S1): skipped — visibly, not silently — unless the
    * environment provides a broker AND the spark-sql-kafka connector jar.
    * Runbook: README "Live Kafka smoke" — drop spark-sql-kafka-0-10 (+
    * kafka-clients, commons-pool2, token-provider) into the unmanaged
    * classpath, export GRAFT_KAFKA_BOOTSTRAP (and optionally
    * GRAFT_KAFKA_TOPIC, default graft_smoke) pointing at a topic holding
    * traffic-schema JSON, and this test drives batch replay + one
    * AvailableNow micro-batch through KafkaEventSource → Parse → count.
    */
  test("live Kafka smoke (env-gated): batch replay + one micro-batch through the connector") {
    val broker = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(broker.nonEmpty,
      "no GRAFT_KAFKA_BOOTSTRAP in env — see README 'Live Kafka smoke' runbook")
    val connector =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    assume(connector,
      "spark-sql-kafka-0-10 not on the classpath — see README 'Live Kafka smoke' runbook")
    val topic = sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "graft_smoke")
    val src = new KafkaEventSource(broker.get, topic,
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(1000))
    // batch replay: the cheapest liveness probe (schema-checked parse)
    val replay = src.batch(spark, Schemas.traffic)
    assert(replay.columns.contains("intersection"))
    val batchRows = replay.count()
    // one bounded micro-batch through the streaming path
    val out = tmpDir("kafka-smoke-out")
    val q = src.stream(spark, Schemas.traffic).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("kafka-smoke-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(spark.read.parquet(out).count() == batchRows)
  }
}
