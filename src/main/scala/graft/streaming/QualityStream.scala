package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.LmScore

/** STREAMING quality meter — q136's
  * ([[graft.operators.LmScore.bigramPerplexity]]) live twin, the lambda
  * pairing every batch gate in this engine gets (q127→q130 drift,
  * q96→q102 budget): each micro-batch of arriving documents is scored
  * against the FROZEN reference LM (trained once, broadcast into every
  * epoch — re-training per batch would let the stream's own drift move
  * the bar), and the meter emits one row per batch: the batch's admit
  * counts plus CUMULATIVE totals across all epochs so far — the
  * "how much of today's crawl survived the perplexity gate" dashboard
  * row, live instead of at the nightly QA sweep.
  *
  * All-integer surface: per-document scores are the q136 micro-nat
  * longs; batch and cumulative aggregates are 64-bit integer sums, so
  * every engine and every replay reproduces the meter bit-for-bit.
  *
  * State protocol = the store family's batch-id-keyed segments
  * ([[DriftStream.driftStaged]]'s exact shape): each micro-batch lands
  * its ONE-ROW (n_docs, n_keep, nll_micro) summary as `_SUCCESS`-gated
  * segment `batchId` (overwrite — a replayed epoch rewrites itself
  * deterministically), and batch k's report reads ONLY segments ≤ k,
  * so the cumulative columns are byte-identical on replay no matter
  * how far the stream ran before a crash.
  *
  * Scale shape: scoring is the q136 shape (broadcast model probes, one
  * doc-keyed sum); the per-batch reduction collapses to ONE row before
  * any write; cumulative state is k one-row segments — no executor
  * state, no state-store migration on restart, and the same segments
  * serve ad-hoc backfill queries.
  */
object QualityStream {

  val segSchema: StructType = StructType(Seq(
    StructField("n_docs", LongType), StructField("n_keep", LongType),
    StructField("nll_micro", LongType)))

  private def segPath(stateDir: String, id: Long): String =
    f"$stateDir/seg_$id%05d"

  private def committedSegments(
      s: org.apache.spark.sql.SparkSession,
      stateDir: String): Seq[(Long, String)] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg_"))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(st => st.getPath.getName.stripPrefix("seg_").toLong ->
        st.getPath.toString)
      .sortBy(_._1)
  }

  /** Sequential-ingest core: score `batch` under the frozen `model`,
    * land its one-row summary as segment `batchId`, and report the
    * meter row over segments ≤ `batchId`:
    * (batch_id, n_docs, n_keep, nll_micro, cum_docs, cum_keep,
    * cum_nll_micro). A document with no bigrams counts in `n_docs`,
    * never in `n_keep` (the q136 rule).
    */
  def meterStaged(
      batch: DataFrame,
      stateDir: String,
      textCol: String,
      idCol: String,
      model: LmScore.BigramLm,
      keepMaxMicroNll: Long,
      batchId: Long): DataFrame = {
    require(keepMaxMicroNll > 0,
      "meterStaged: keepMaxMicroNll must be positive")
    val s = batch.sparkSession
    val scored = LmScore.scoreBigrams(batch, textCol, idCol, model)
    batch.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_bigrams") > 0 &&
          col("nll_micro") <= col("n_bigrams") * keepMaxMicroNll,
          1L).otherwise(0L)).as("n_keep"),
        sum(coalesce(col("nll_micro"), lit(0L))).as("nll_micro"))
      .write.mode("overwrite").parquet(segPath(stateDir, batchId))
    val segs = committedSegments(s, stateDir)
      .filter { case (id, _) => id <= batchId }.map(_._2)
    val cum = s.read.schema(segSchema).parquet(segs: _*)
      .agg(sum(col("n_docs")).as("cum_docs"),
        sum(col("n_keep")).as("cum_keep"),
        sum(col("nll_micro")).as("cum_nll_micro"))
    s.read.schema(segSchema).parquet(segPath(stateDir, batchId))
      .crossJoin(broadcast(cum))
      .select(lit(batchId).as("batch_id"), col("n_docs"), col("n_keep"),
        col("nll_micro"), col("cum_docs"), col("cum_keep"),
        col("cum_nll_micro"))
  }

  /** Live Structured-Streaming twin: drive [[meterStaged]] per
    * micro-batch via foreachBatch, landing each epoch's meter row under
    * `outDir/batch_id=<id>` with OVERWRITE — a replayed epoch rewrites
    * its own directory with identical rows (segments newer than the
    * epoch are excluded by construction), so the output table is
    * idempotent under the checkpoint's replay contract.
    */
  def monitor(
      stream: DataFrame,
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      textCol: String,
      idCol: String,
      model: LmScore.BigramLm,
      keepMaxMicroNll: Long): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        meterStaged(df, stateDir, textCol, idCol, model,
          keepMaxMicroNll, id)
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        ()
      }
      .start()
}
