package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.BudgetStream
import graft.streaming.BudgetStream.{Admission, Arrival}

class BudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  test("live admissions: per-source meter persists across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Arrival]
    val q = BudgetStream.admissions(in.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("budget_out")
      .option("checkpointLocation", tmpDir("budget-ckpt"))
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: a fills 0→7 (both admitted); b fills 0→9
      in.addData(
        Arrival(1L, "a", 4L), Arrival(2L, "a", 3L), Arrival(3L, "b", 9L))
      q.processAllAvailable()
      // batch 2: a at 7 (< 10, admitted — meter carried over), then 12
      // (full, dropped); b at 9 still has room, then 10 is full
      in.addData(
        Arrival(4L, "a", 5L), Arrival(5L, "a", 1L),
        Arrival(6L, "b", 1L), Arrival(7L, "b", 1L))
      q.processAllAvailable()
      val got = spark.table("budget_out").as[Admission].collect()
        .sortBy(_.doc_id).toSeq
      assert(got == Seq(
        Admission(1L, "a", 4L, 0L, true),
        Admission(2L, "a", 3L, 4L, true),
        Admission(3L, "b", 9L, 0L, true),
        Admission(4L, "a", 5L, 7L, true),
        Admission(5L, "a", 1L, 12L, false),
        Admission(6L, "b", 1L, 9L, true),
        Admission(7L, "b", 1L, 10L, false)))
    } finally q.stop()
  }

  test("live admissions fold each micro-batch group in doc_id order") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Arrival]
    val q = BudgetStream.admissions(in.toDS(), budget = 5L)
      .writeStream.format("memory").queryName("budget_ord")
      .option("checkpointLocation", tmpDir("budget-ord-ckpt"))
      .outputMode(OutputMode.Append)
      .start()
    try {
      // delivered out of id order in one batch: 22 must be metered AFTER
      // 21, so 22 sees cum_before 4 and is admitted, 23 is not
      in.addData(
        Arrival(23L, "a", 1L), Arrival(22L, "a", 2L), Arrival(21L, "a", 4L))
      q.processAllAvailable()
      val got = spark.table("budget_ord").as[Admission].collect()
        .sortBy(_.doc_id).toSeq
      assert(got == Seq(
        Admission(21L, "a", 4L, 0L, true),
        Admission(22L, "a", 2L, 4L, true),
        Admission(23L, "a", 1L, 6L, false)))
    } finally q.stop()
  }

  test("admitStaged: persisted meter matches the live path; replay idempotent") {
    val dir = tmpDir("budget-staged")
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "source", "text")
    // texts of 4, 3, 5, 1 tokens
    val b0 = mk((1L, "a", "w w w w"), (2L, "a", "x x x"), (3L, "b", "y y y y y"))
    val b1 = mk((4L, "a", "z z z z z"), (5L, "b", "q"))
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      BudgetStream.admitStaged(b, dir, "text", "doc_id", "source",
        budget = 6L, batchId = id)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val r0 = run(b0, 0L)
    assert(r0 == Seq(
      (1L, "a", 4L, 0L, true), (2L, "a", 3L, 4L, true),
      (3L, "b", 5L, 0L, true)))
    val r1 = run(b1, 1L)
    assert(r1 == Seq((4L, "a", 5L, 7L, false), (5L, "b", 1L, 5L, true)))
    // replay of batch 1 reads only strictly-older segments: identical
    assert(run(b1, 1L) == r1)
    // the meter counted every arrived token, admitted or not
    val spent = BudgetStream.loadSpent(spark, dir, Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spent == Map("a" -> 12L, "b" -> 6L))
  }

  test("compact: per-source fold is sum-exact, replay-safe; debris below the bound invisible") {
    val dir = tmpDir("budget-compact")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(n: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$n"))
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "source", "text")
    val b0 = mk((1L, "a", "w w w w"), (2L, "a", "x x x"), (3L, "b", "y y y y y"))
    val b1 = mk((4L, "a", "z z z z z"), (5L, "b", "q"))
    val b2 = mk((6L, "b", "r r"))
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      BudgetStream.admitStaged(b, dir, "text", "doc_id", "source",
        budget = 6L, batchId = id)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    run(b0, 0L); val r1 = run(b1, 1L)
    // fold segment 0; the newest is spared (the stream discipline)
    assert(BudgetStream.compact(spark, dir, keepNewestSegments = 1) == 1L)
    assert(!exists("m_00000") && exists("gen_00001"))
    // decisions after the fold and the newest-epoch replay: identical
    val r2 = run(b2, 2L)
    assert(r2 == Seq((6L, "b", 2L, 6L, false))) // b spent 5+1 before
    assert(run(b1, 1L) == r1)
    // crash-left sub-bound segment never double-counts
    Seq(("a", 999L)).toDF("source", "__spent")
      .write.mode("overwrite").parquet(s"$dir/m_00000")
    assert(run(b2, 2L) == r2)
    val spent = BudgetStream.loadSpent(spark, dir, Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spent == Map("a" -> 12L, "b" -> 8L))
    // keep=0 folds everything; a replay below the bound fails loudly
    assert(BudgetStream.compact(spark, dir, keepNewestSegments = 0) == 3L)
    intercept[IllegalArgumentException] { run(b2, 2L) }
    assert(BudgetStream.compact(spark, dir) == -1L)
  }

  test("self-maintaining sink: compactEvery folds old segments, decisions identical") {
    val state = tmpDir("budget-auto-state")
    val out = tmpDir("budget-auto-out")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ex(n: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$state/$n"))
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "source", "text")
    val sink = BudgetStream.sink(state, out, "text", "doc_id", "source",
      budget = 6L, compactEvery = 2)
    sink(mk((1L, "a", "w w w w"), (2L, "a", "x x x")), 0L)
    sink(mk((3L, "a", "y")), 1L)
    sink(mk((4L, "a", "z z")), 2L) // compacts after: folds m_0, m_1
    assert(!ex("m_00000") && !ex("m_00001") && ex("m_00002"))
    assert(ex("gen_00001"))
    val got = spark.read
      .parquet(s"$out/batch=0", s"$out/batch=1", s"$out/batch=2")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq
    // meter: a spends 4,3 (b0), 1 (b1), 2 (b2) — cum 0,4,7,8
    assert(got == Seq((1L, 0L, true), (2L, 4L, true), (3L, 7L, false),
      (4L, 8L, false)))
  }

  test("purgeSuperseded reclaims crash debris the reader can't see") {
    val dir = tmpDir("budget-purge")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(n: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$n"))
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "source", "text")
    BudgetStream.admitStaged(mk((1L, "a", "w w")), dir, "text", "doc_id",
      "source", 6L, 0L).collect()
    BudgetStream.admitStaged(mk((2L, "a", "x")), dir, "text", "doc_id",
      "source", 6L, 1L).collect()
    BudgetStream.admitStaged(mk((3L, "b", "y y y")), dir, "text", "doc_id",
      "source", 6L, 2L).collect()
    assert(BudgetStream.compact(spark, dir, keepNewestSegments = 1) == 2L)
    // fabricate the crash shapes a half-done compaction leaves behind:
    // a folded segment the cleanup missed (id < foldedBelow), a stale
    // generation marker + data dir, and an uncommitted gen tmp file
    Seq(("a", 999L)).toDF("source", "__spent")
      .write.mode("overwrite").parquet(s"$dir/m_00000")
    Seq(("a", 777L)).toDF("source", "__spent")
      .write.mode("overwrite").parquet(s"$dir/gen_data_00000")
    val mk0 = fs.create(new org.apache.hadoop.fs.Path(s"$dir/gen_00000"), true)
    mk0.write("gen_data_00000\t1".getBytes("UTF-8")); mk0.close()
    val tmp = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/gen_00002.tmp"), true)
    tmp.write("half-written".getBytes("UTF-8")); tmp.close()
    val before = BudgetStream.loadSpent(spark, dir, Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val purged = BudgetStream.purgeSuperseded(spark, dir)
    assert(purged.size == 4, purged.mkString(", "))
    assert(!exists("m_00000") && !exists("gen_00000") &&
      !exists("gen_data_00000") && !exists("gen_00002.tmp"))
    // the live generation + replay horizon survive, reader unchanged
    assert(exists("gen_00001") && exists("m_00002"))
    val after = BudgetStream.loadSpent(spark, dir, Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before && after == Map("a" -> 3L, "b" -> 3L))
    // idempotent: a second purge finds nothing
    assert(BudgetStream.purgeSuperseded(spark, dir).isEmpty)
  }

  test("admitStaged joins the meter broadcast — no batch-side exchange for state") {
    val dir = tmpDir("budget-plan")
    val b0 = Seq((1L, "a", "w w")).toDF("doc_id", "source", "text")
    BudgetStream.admitStaged(b0, dir, "text", "doc_id", "source", 6L, 0L)
      .collect()
    // assert on the lazy admission plan (admitStaged itself returns the
    // eagerly checkpointed frame, whose executed plan is an RDD scan)
    val plan = BudgetStream
      .admissionFrame(b0, dir, "text", "doc_id", "source", 6L, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
