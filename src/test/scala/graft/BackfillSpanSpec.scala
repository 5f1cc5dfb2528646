package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Fused-backfill ExactSubstr ([[Dedup.dupSpansBackfillStaged]] /
  * [[Dedup.stripDupSpansBackfillStaged]]) — one corpus pass over a
  * backlog of batches must be ROW-IDENTICAL to folding the sequential
  * staged loop over the same batches, and must leave an
  * indistinguishable store behind (same segment count, same
  * accumulated gram → owner set).
  */
class BackfillSpanSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3

  // planted corpus: within-batch dup (b0: docs 1/2 share "p q r s"),
  // cross-batch dup (b1 doc 11 repeats b0's "p q r s"; b2 doc 21
  // repeats b1's "u v w"), short doc (sentinel path), unique docs
  private val b0 = Seq(
    (1L, "p q r s a b c"), (2L, "z z p q r s"), (3L, "m n"))
  private val b1 = Seq(
    (11L, "k p q r s t"), (12L, "u v w x y"))
  private val b2 = Seq(
    (21L, "h u v w"), (22L, "only unique tokens here"))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def backlog(batches: Seq[Seq[(Long, String)]]): DataFrame =
    batches.zipWithIndex
      .map { case (b, i) => df(b).withColumn("b", lit(i.toLong)) }
      .reduce(_ unionByName _)

  private def profRows(d: DataFrame) = d
    .select("doc_id", "n_tokens", "dup_spans", "dup_tokens", "dup_ratio")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq

  private def stripRows(d: DataFrame) = d
    .select("doc_id", "n_tokens", "kept_tokens", "clean_text")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).sortBy(_._1).toSeq

  private def storeState(dir: String): (Int, Set[(String, Long)]) = {
    val segs = Dedup.FingerprintStore.segments(spark, dir)
    val rows = Dedup.FingerprintStore.load(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    (segs.size, rows)
  }

  test("backfill profile == sequential staged loop; stores indistinguishable") {
    val seqDir = tmpDir("bf-seq")
    val fusedDir = tmpDir("bf-fused")
    val seqOut = Seq(b0, b1, b2).map(b =>
      Dedup.dupSpansIncrementalStaged(df(b), seqDir, "text", "doc_id", k)
        .localCheckpoint(true))
      .reduce(_ unionByName _)
    val fusedOut = Dedup.dupSpansBackfillStaged(
      backlog(Seq(b0, b1, b2)), "b", fusedDir, "text", "doc_id", k)
    assert(profRows(fusedOut) == profRows(seqOut))
    // cross-batch dup really fires: doc 11 repeats b0's "p q r s"
    assert(profRows(fusedOut).find(_._1 == 11L).exists(_._3 >= 1L))
    // short doc rides the sentinel path: 2 tokens, no spans
    assert(profRows(fusedOut).find(_._1 == 3L).contains((3L, 2L, 0L, 0L, 0.0)))
    assert(storeState(fusedDir) == storeState(seqDir))
  }

  test("backfill strip == sequential staged strip") {
    val seqDir = tmpDir("bf-seq-strip")
    val fusedDir = tmpDir("bf-fused-strip")
    val seqOut = Seq(b0, b1, b2).map(b =>
      Dedup.stripDupSpansIncrementalStaged(df(b), seqDir, "text", "doc_id", k)
        .localCheckpoint(true))
      .reduce(_ unionByName _)
    val fusedOut = Dedup.stripDupSpansBackfillStaged(
      backlog(Seq(b0, b1, b2)), "b", fusedDir, "text", "doc_id", k)
    assert(stripRows(fusedOut) == stripRows(seqOut))
    assert(storeState(fusedDir) == storeState(seqDir))
  }

  test("backfill against a NON-empty store probes pre-existing history") {
    val seqDir = tmpDir("bf-seq-pre")
    val fusedDir = tmpDir("bf-fused-pre")
    // both stores pre-seeded with b0 through the sequential path
    Dedup.dupSpansIncrementalStaged(df(b0), seqDir, "text", "doc_id", k)
      .localCheckpoint(true)
    Dedup.dupSpansIncrementalStaged(df(b0), fusedDir, "text", "doc_id", k)
      .localCheckpoint(true)
    val seqOut = Seq(b1, b2).map(b =>
      Dedup.dupSpansIncrementalStaged(df(b), seqDir, "text", "doc_id", k)
        .localCheckpoint(true))
      .reduce(_ unionByName _)
    val fusedOut = Dedup.dupSpansBackfillStaged(
      backlog(Seq(b1, b2)), "b", fusedDir, "text", "doc_id", k)
    assert(profRows(fusedOut) == profRows(seqOut))
    assert(storeState(fusedDir) == storeState(seqDir))
  }

  test("an exact replay batch inside the backlog strips to nothing (store semantics)") {
    // b0 then b0 again as the second backlog entry: every gram of the
    // replayed copy is history, so the whole copy is one duplicated
    // span per doc — kept_tokens 0 (the documented remove-both policy
    // extended across batches)
    val dir = tmpDir("bf-replay")
    val out = stripRows(Dedup.stripDupSpansBackfillStaged(
      backlog(Seq(b0, b0)), "b", dir, "text", "doc_id", k))
    // batch 1's copies (same doc ids) keep zero tokens
    val second = out.filter(_._4 == "") // fully stripped rows
    assert(second.map(_._1).toSet == Set(1L, 2L))
    // doc 3 ("m n") is SHORTER than k: it carries no grams, so neither
    // copy can ever be flagged — both survive intact
    assert(out.count(t => t._1 == 3L && t._4 == "m n") == 2)
  }

  test("maxBacklogBatches bounds the driver-side distinct-batch collect") {
    // a backlog past the bound fails FAST with a pointer to the
    // sequential loop, before any segment is committed
    val dir = tmpDir("bf-guard")
    val ex = intercept[IllegalArgumentException] {
      Dedup.dupSpansBackfillStaged(
        backlog(Seq(b0, b1, b2)), "b", dir, "text", "doc_id", k,
        maxBacklogBatches = 2)
    }
    assert(ex.getMessage.contains("maxBacklogBatches"))
    assert(Dedup.FingerprintStore.segments(spark, dir).isEmpty,
      "guard must fire before any segment commit")
    // an incoherent bound is rejected at call time
    intercept[IllegalArgumentException] {
      Dedup.dupSpansBackfillStaged(
        backlog(Seq(b0)), "b", dir, "text", "doc_id", k,
        maxBacklogBatches = 0)
    }
    // at the bound, the backfill completes normally
    val ok = Dedup.dupSpansBackfillStaged(
      backlog(Seq(b0, b1)), "b", dir, "text", "doc_id", k,
      maxBacklogBatches = 2)
    assert(ok.count() > 0)
  }
}
