package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: prints the executed plan + per-stage task counts of one
  * CurationStream.processBatch over a synthesized WET epoch — the tool
  * that localizes a single-task stage (q190 sf1 serialization hunt).
  * Usage: runMain graft.tools.DebugCuration [sfDir]
  */
object DebugCuration {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        println(f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0}%7.2fs  ${si.name.take(80)}")
      }
    })
    val root =
      java.nio.file.Files.createTempDirectory("graft_dbg_cur").toString
    val docs0 = graft.Tables.documents(spark, sfDir)
    val d = col("doc_id")
    val id = d.cast("string")
    val h = d - pmod(d, lit(10))
    val h2 = when(pmod(h, lit(40)) === 20 && h >= 200, h - 200).otherwise(h)
    val picked = docs0.select(d, h2.as("__h"))
      .join(docs0.select(d.as("__h"),
        coalesce(col("text"), lit("")).as("__t")), Seq("__h"))
    val half = (length(col("__t")) / lit(2)).cast("int")
    val markup = concat(
      lit("<html><head><title>Doc "), id, lit("</title></head><body><p>"),
      col("__t").substr(lit(1), half), lit("</p><p>"),
      col("__t").substr(half + lit(1), length(col("__t"))),
      lit(" and further details</p></body></html>"))
    val uri = concat(lit("https://www.site"),
      expr("(doc_id div 10) % 5").cast("string"), lit(".net/doc/"), id)
    graft.io.Wet.toRecords(
        picked.select(d, markup.as("wet_text"), uri.as("uri")),
        "wet_text", "uri")
      .coalesce(1).write.mode("overwrite")
      .option("lineSep", graft.io.Wet.RecordSeparator)
      .text(s"$root/wet")
    val read = graft.io.Wet.read(spark, s"$root/wet")
    println(s"scan partitions = ${read.rdd.getNumPartitions}")
    val cs = new graft.streaming.CurationStream(
      spark, s"$root/dedup", s"$root/budget", s"$root/out",
      budget = 300L, compactEvery = 0)
    val t0 = System.nanoTime()
    val out = cs.processBatch(read, 0L)
    out.explain("formatted")
    out.write.mode("overwrite").parquet(s"$root/out/batch=0")
    println(f"batch wall ${(System.nanoTime() - t0) / 1e9}%.1fs")
    Thread.sleep(2000)
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
