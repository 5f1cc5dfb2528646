package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ParquetUpsertTable

/** Streaming CDC apply: micro-batches of change rows merged into a
  * versioned parquet table, exactly-once table state from
  * at-least-once batch delivery.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def state(t: ParquetUpsertTable): Map[Long, (Long, String)] =
    t.snapshot().get.collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[Long]("v"), r.getAs[String]("p"))))
      .toMap

  test("three change batches through a real stream yield the merged table") {
    val dir = tmpDir("graft_upsert_tbl")
    val table = new ParquetUpsertTable(spark, dir, Seq("k"), "v")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val q = mem.toDF().toDF("k", "v", "p")
      .writeStream
      .option("checkpointLocation", tmpDir("graft_upsert_ckpt"))
      .foreachBatch(table.sink)
      .start()
    try {
      mem.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      assert(state(table) == Map(1L -> ((1L, "a1")), 2L -> ((1L, "b1"))))
      mem.addData((1L, 2L, "a2"), (3L, 1L, "c1"))
      q.processAllAvailable()
      assert(state(table) == Map(1L -> ((2L, "a2")), 2L -> ((1L, "b1")),
        3L -> ((1L, "c1"))))
      // stale change (v=1 < committed v=2 for key 1) must NOT regress the row
      mem.addData((1L, 1L, "a0-late"), (2L, 5L, "b2"))
      q.processAllAvailable()
      assert(state(table) == Map(1L -> ((2L, "a2")), 2L -> ((5L, "b2")),
        3L -> ((1L, "c1"))))
    } finally q.stop()
  }

  test("replaying a committed batch id is a no-op (no rewrite, no regression)") {
    val dir = tmpDir("graft_upsert_replay")
    val table = new ParquetUpsertTable(spark, dir, Seq("k"), "v", keepVersions = 3)
    table.applyBatch(Seq((1L, 1L, "a1")).toDF("k", "v", "p"), batchId = 0)
    table.applyBatch(Seq((1L, 2L, "a2")).toDF("k", "v", "p"), batchId = 1)
    val committed = state(table)
    // at-least-once delivery: batch 0 arrives again after batch 1 was
    // committed — already folded in, so nothing moves
    table.applyBatch(Seq((1L, 1L, "a1")).toDF("k", "v", "p"), batchId = 0)
    assert(table.latestVersion.get.endsWith("1"))
    assert(state(table) == committed)
  }

  test("a crashed half-written version is invisible and reclaimed on replay") {
    val dir = tmpDir("graft_upsert_crash")
    val table = new ParquetUpsertTable(spark, dir, Seq("k"), "v")
    table.applyBatch(Seq((1L, 1L, "a1")).toDF("k", "v", "p"), batchId = 0)
    // simulate a crash mid-write of batch 1: a version dir with data
    // files but NO _SUCCESS marker (the committer writes it last)
    val partial = new java.io.File(dir, "v_00000000000000000001")
    assert(partial.mkdirs())
    val junk = new java.io.File(partial, "part-00000.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    // readers never see the partial version
    assert(table.latestVersion.get.endsWith("0"))
    assert(state(table) == Map(1L -> ((1L, "a1"))))
    // the replayed batch overwrites the partial dir and commits it
    table.applyBatch(Seq((1L, 5L, "a2")).toDF("k", "v", "p"), batchId = 1)
    assert(table.latestVersion.get.endsWith("1"))
    assert(state(table) == Map(1L -> ((5L, "a2"))))
    assert(!junk.exists()) // the crashed attempt's file is gone
  }

  test("same-key same-version conflict resolves deterministically") {
    import graft.operators.Merge
    val base = Seq((1L, 0L, "base")).toDF("k", "v", "p")
    val conflicted = Seq((1L, 5L, "x"), (1L, 5L, "y")).toDF("k", "v", "p")
      .repartition(4) // spread across partitions: arrival order must not matter
    val winners = (1 to 5).map { _ =>
      Merge.upsertLatest(base, conflicted, Seq("k"), "v")
        .collect().map(_.getString(2)).toSeq
    }
    assert(winners.distinct == Seq(Seq("y"))) // ties break by remaining cols desc
  }

  test("old versions are GC'd beyond keepVersions; in-batch dup keys collapse") {
    val dir = tmpDir("graft_upsert_gc")
    val table = new ParquetUpsertTable(spark, dir, Seq("k"), "v", keepVersions = 1)
    table.applyBatch(Seq((1L, 1L, "x"), (1L, 9L, "y")).toDF("k", "v", "p"), 0)
    table.applyBatch(Seq((2L, 1L, "z")).toDF("k", "v", "p"), 1)
    assert(state(table) == Map(1L -> ((9L, "y")), 2L -> ((1L, "z"))))
    val vdirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_")).map(_.getName)
    assert(vdirs.toSeq == Seq("v_00000000000000000001"))
  }
}
