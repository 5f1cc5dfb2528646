package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Wet

/** [[graft.streaming.CurationStream]] — the q153 curation chain as a
  * checkpointed STREAM: .wet files drained one per trigger
  * (`maxFilesPerTrigger` backpressure), WET framing identical to the
  * batch reader, cross-epoch dedup through the persisted fingerprint
  * store, per-domain budget through the persisted meter, gzip member
  * transparency, self-maintenance, and an idempotent epoch replay.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def body(i: Int): String = Seq("alpha", "bravo", "charlie",
    "delta", "echo", "foxtrot", "golf", s"doc$i").mkString(" ")

  private def markup(b: String): String =
    s"<html><body><p>$b</p></body></html>"

  /** Render (uri, markup) pairs as one .wet file's bytes. */
  private def wetBytes(rows: Seq[(String, String)]): Array[Byte] = {
    val recs = rows.toDF("uri", "m")
      .select(col("uri"), col("m").as("wet_text"))
    Wet.toRecords(recs, "wet_text", "uri")
      .collect().map(_.getString(0))
      .mkString("", Wet.RecordSeparator, Wet.RecordSeparator)
      .getBytes("UTF-8")
  }

  private def uri(host: String, i: Int) = s"https://$host/doc/$i"

  test("streaming WET source framing equals the batch reader") {
    val dir = tmpDir("cstream-framing")
    Files.write(Paths.get(s"$dir/000.wet"), wetBytes(Seq(
      uri("a.example.com", 1) -> "payload one\nsecond line",
      uri("a.example.com", 2) -> "payload two")))
    val want = Wet.read(spark, s"$dir/000.wet")
      .select("target_uri", "content_length", "payload", "length_ok")
      .collect().map(_.toString).sorted.toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = Wet.readStream(spark, dir)
      .writeStream.option("checkpointLocation", tmpDir("cstream-fr-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df
          .select("target_uri", "content_length", "payload", "length_ok")
          .collect().map(_.toString)
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(got.sorted.toSeq == want && want.size == 2)
  }

  test("routing filter never pushes the extract chain into the raw WET scan") {
    // the round-17 regression this pins: Catalyst pushes the routing
    // filter — whose n_kept > 0 conjunct inlines the WHOLE extract
    // zip_with chain — through the round-robin exchange into the WET
    // scan stage, and a one-file micro-batch then runs the chain on
    // ONE task (observed: an 80 s single task on 32 idle cores at
    // sf0.1). processBatch's persisted parse frame is the pushdown
    // barrier; this walks every cached-plan layer and asserts each
    // extract-bearing filter reads a cache, never the raw scan.
    val dir = tmpDir("cstream-plan")
    Files.write(Paths.get(s"$dir/000.wet"), wetBytes(Seq(
      uri("a.example.com", 1) -> markup(body(1)))))
    val cs = new CurationStream(spark, tmpDir("cs-pl-store"),
      tmpDir("cs-pl-meter"), tmpDir("cs-pl-out"), budget = 100L,
      keepLangs = graft.operators.LangId.Langs)
    val mk = graft.util.OperatorCaches.mark()
    try {
      import org.apache.spark.sql.catalyst.expressions.{Expression, ZipWith}
      import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      import org.apache.spark.sql.graft.CharNgramBucketCounts
      // processBatch returns the eagerly checkpointed decision frame
      // (r18's one-execution admitStaged fold), whose plan is an RDD
      // scan — walk the batch's REGISTERED cached frames instead: the
      // routed frame's plan layers carry the routing filter this test
      // pins (collected handles = exactly this batch's registrations)
      val (_, frames) = graft.util.OperatorCaches.collecting {
        cs.processBatch(Wet.read(spark, s"$dir/000.wet"), 0L)
      }
      // walk nested cache layers too (the heavy filter lives INSIDE the
      // routed frame's cached child plan, invisible to a flat collect),
      // unwrapping AQE roots — collect does not descend into them
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case other => other
      }
      def layers(p0: SparkPlan): Seq[SparkPlan] = {
        val p = unwrap(p0)
        p +: p.collect { case s: InMemoryTableScanExec => s }
          .flatMap(s => layers(s.relation.cachedPlan))
      }
      // the routing filter's heavy inlined kernel: the zero-join r18
      // shape inlines langid's CharNgramBucketCounts histogram into the
      // filter (n_kept/noindex are materialized cache columns now);
      // ZipWith still matches the pre-r18 shape should it return
      def isHeavy(e: Expression): Boolean = e.collectFirst {
        case z: ZipWith => z
        case c: CharNgramBucketCounts => c
      }.isDefined
      val heavy = frames
        .flatMap(f => layers(f.queryExecution.executedPlan))
        .flatMap(_.collect {
          case f: FilterExec if isHeavy(f.condition) => f
        })
      assert(heavy.nonEmpty, "expected the extract-bearing routing filter")
      heavy.foreach { f =>
        assert(f.child.toString.contains("InMemoryTableScan") ||
          f.child.toString.contains("TableCacheQueryStage"),
          s"extract-chain filter reads the raw scan (no cache barrier):\n$f")
      }
    } finally graft.util.OperatorCaches.releaseSince(spark, mk)
  }

  test("3 epochs: backpressure, cross-epoch dedup, per-domain budget, gz, replay") {
    val wetDir = tmpDir("cstream-wet")
    val store = tmpDir("cstream-store")
    val meter = tmpDir("cstream-meter")
    val out = tmpDir("cstream-out")
    // f1: docs 1,2 (unique; example.com). f2: doc 3 = byte-dup of doc 1's
    // body under a new uri (must dedup), doc 4 tiny (extract drops).
    // f3 (GZIPPED): doc 5 (example.com — meter already at 16 ≥ budget 12,
    // not admitted), doc 6 (other.org — fresh meter, admitted).
    Files.write(Paths.get(s"$wetDir/000.wet"), wetBytes(Seq(
      uri("a.example.com", 1) -> markup(body(1)),
      uri("b.example.com", 2) -> markup(body(2)))))
    // doc 7: valid body but meta-robots noindex — the publisher opt-out
    // must drop it before it can touch the dedup store or the meter
    Files.write(Paths.get(s"$wetDir/001.wet"), wetBytes(Seq(
      uri("c.example.com", 3) -> markup(body(1)),
      uri("d.example.com", 4) -> markup("tiny"),
      uri("f.example.com", 7) ->
        ("<html><head><meta name=\"robots\" content=\"noindex\">" +
          s"</head><body><p>${body(7)}</p></body></html>"))))
    Paths.get(s"$wetDir/000.wet").toFile.setLastModified(1000000L)
    Paths.get(s"$wetDir/001.wet").toFile.setLastModified(2000000L)
    val cs = new CurationStream(spark, store, meter, out, budget = 12L,
      keepLangs = graft.operators.LangId.Langs, compactEvery = 2)
    val ckpt = tmpDir("cstream-ckpt")
    val q1 = cs.start(wetDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    // one file per trigger: two committed epochs so far
    assert(Files.exists(Paths.get(s"$out/batch=0")) &&
      Files.exists(Paths.get(s"$out/batch=1")))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(s"$wetDir/002.wet.gz")))
    gz.write(wetBytes(Seq(
      uri("e.example.com", 5) -> markup(body(5)),
      uri("www.other.org", 6) -> markup(body(6)))))
    gz.close()
    val q2 = cs.start(wetDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val dec = cs.decisions()
      .select("doc_id", "source", "n_tokens", "cum_before", "admitted")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // doc 3 (cross-epoch dup), doc 4 (extract-dropped), and doc 7
    // (noindex opt-out) never reach the budget; docs 1/2 admitted;
    // doc 5 arrives at a filled meter; doc 6's domain has its own meter
    assert(dec.keySet == Set(1L, 2L, 5L, 6L))
    assert(dec(1L) == (("example.com", 8L, 0L, true)))
    assert(dec(2L) == (("example.com", 8L, 8L, true)))
    assert(dec(5L) == (("example.com", 8L, 16L, false)))
    assert(dec(6L) == (("other.org", 8L, 0L, true)))
    // self-maintenance ran at epoch 2: the meter holds a generation
    val meterFiles = Paths.get(meter).toFile.list().toSeq
    assert(meterFiles.exists(_.startsWith("gen_")), meterFiles.toString)
    // epoch replay is idempotent: re-processing batch 2's records
    // re-derives byte-identical decisions (store reads strictly below 2).
    // Direct processBatch callers own cache release — without the mark
    // window the three registered frames (docs/main/routed) stay pinned
    // in the shared cross-suite session for the rest of the sbt run.
    val mk = graft.util.OperatorCaches.mark()
    val replay = cs.processBatch(
      Wet.read(spark, s"$wetDir/002.wet.gz"), 2L)
      .select("doc_id", "source", "n_tokens", "cum_before", "admitted")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    graft.util.OperatorCaches.releaseSince(spark, mk)
    assert(replay == Map(
      5L -> (("example.com", 8L, 16L, false)),
      6L -> (("other.org", 8L, 0L, true))))
  }
}
