package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only): times the components of the q89
  * incremental dup-span pipeline at a given sf dir.
  */
object ScratchTime {
  def main(argv: Array[String]): Unit = {
    val dir = argv.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[time] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    println(s"[time] docs=${docs.count()}")

    // one-shot profile (q84 shape)
    time("q84 one-shot profile") {
      graft.operators.Dedup.dupSpanProfile(docs, "text", "doc_id", k = 8).count()
    }

    // components
    val toks = docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    time("tokenize only") { toks.agg(sum(size(col("toks")))).first() }
    val grams = toks.select(col("doc_id"),
      graft.functions.TextFunctions.ngramsOfTokens(col("toks"), 8).as("grams"))
    time("tokenize+grams") { grams.agg(sum(size(col("grams")))).first() }
    val occMd5 = grams
      .select(col("doc_id"), posexplode(col("grams")).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), md5(col("gram")).as("g"))
    time("explode+md5 (count)") { occMd5.count() }
    val occ64 = grams
      .select(col("doc_id"), posexplode(col("grams")).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), xxhash64(col("gram")).as("g"))
    time("explode+xxhash64 (count)") { occ64.count() }
    import org.apache.spark.sql.expressions.Window
    time("window cnt over md5 g") {
      occMd5.withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
        .filter(col("cnt") >= 2).count()
    }
    time("window cnt over long g") {
      occ64.withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
        .filter(col("cnt") >= 2).count()
    }
    time("groupBy md5 g count") {
      occMd5.groupBy(col("g")).agg(count(lit(1)).as("cnt"), min(col("doc_id")))
        .filter(col("cnt") >= 2).count()
    }
    time("groupBy long g count") {
      occ64.groupBy(col("g")).agg(count(lit(1)).as("cnt"), min(col("doc_id")))
        .filter(col("cnt") >= 2).count()
    }

    // full incremental sequence (q89 shape)
    time("q89 full incremental (3 batches)") {
      graft.Queries.incrementalDupSpans(s, dir).count()
    }

    // staged breakdown of one incremental pass against a warm store
    {
      import graft.operators.Dedup
      val storeDir = java.nio.file.Files.createTempDirectory("scratch_gram").toString
      time("batch0 (empty store)") {
        Dedup.dupSpansIncrementalStaged(docs, storeDir, "text", "doc_id", 8)
          .localCheckpoint(true).count()
      }
      time("batch1 (store=corpus grams)") {
        Dedup.dupSpansIncrementalStaged(
          docs.select((col("doc_id") + 100000).as("doc_id"), col("text")),
          storeDir, "text", "doc_id", 8).localCheckpoint(true).count()
      }
      time("compact(8)") {
        Dedup.FingerprintStore.compact(s, storeDir, buckets = 8,
          tablePrefix = "scratch_store")
      }
      time("batch2 (post-compaction)") {
        Dedup.dupSpansIncrementalStaged(
          docs.select((col("doc_id") + 200000).as("doc_id"), col("text")),
          storeDir, "text", "doc_id", 8).localCheckpoint(true).count()
      }
      Dedup.FingerprintStore.currentGenTable(s, storeDir)
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      graft.io.Sinks.truncatePath(s, storeDir)
    }

    // fine-grained: replicate one batch's internals step by step
    {
      import graft.functions.TextFunctions
      import org.apache.spark.sql.expressions.Window
      val toksF = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      val gramsF = toksF.select(col("doc_id"), col("toks"),
        TextFunctions.ngramsOfTokens(col("toks"), 8).as("grams"))
      val occF = gramsF
        .select(col("doc_id"), posexplode(col("grams")).as(Seq("p0", "gram")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), md5(col("gram")).as("g"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
      val occCk = time("  occ localCheckpoint") { occF.localCheckpoint(true) }
      println(s"[time]   occ rows = ${occCk.count()}")
      val nTokCk = time("  nTok localCheckpoint") {
        toksF.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
          .localCheckpoint(true)
      }
      val dupF = occCk.filter(col("cnt") >= 2)
      time("  profile from checkpoints") {
        val spans = dupF.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
        nTokCk.join(spans, Seq("doc_id"), "left").count()
      }
      time("  segment write (groupBy+parquet)") {
        val seg = java.nio.file.Files.createTempDirectory("scratch_seg").toString
        occCk.groupBy(col("g")).agg(min(col("doc_id")).as("doc_id"))
          .write.mode("overwrite").parquet(seg)
        graft.io.Sinks.truncatePath(s, seg)
      }
    }
    s.stop()
  }
}
