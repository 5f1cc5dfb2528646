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
  * [[compact]] folds old one-row segments into a single GENERATION row
  * (marker + `foldedBelow` bound, the FingerprintStore protocol), so a
  * long-lived meter lists O(keepNewestSegments) paths per epoch instead
  * of one per batch since stream start. The fold is SUM-safe under
  * crashes: the reader takes the generation plus only segments with
  * id ≥ `foldedBelow`, so a folded segment a crashed cleanup left
  * behind can never double-count — it is invisible the moment the
  * marker renames in.
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

  /** Newest committed generation: (dataSub, foldedBelow, genNo) from
    * the highest `gen_*` marker; the generation row covers segments
    * with id strictly below `foldedBelow`.
    */
  private def currentGen(
      s: org.apache.spark.sql.SparkSession,
      stateDir: String): Option[(String, Long, Long)] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("gen_\\d{5,}"))
      .sortBy(_.getPath.getName.stripPrefix("gen_").toLong)
      .lastOption.map { st =>
        val in = fs.open(st.getPath)
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val genNo = st.getPath.getName.stripPrefix("gen_").toLong
        content.split("\t") match {
          case Array(sub, below) => (sub, below.toLong, genNo)
          case other => sys.error(
            s"malformed quality-meter generation marker in $stateDir: " +
              other.mkString("\\t"))
        }
      }
  }

  /** Fold committed segments (except the newest `keepNewestSegments`)
    * into ONE generation row — the cumulative (n_docs, n_keep,
    * nll_micro) over everything folded, absorbing any previous
    * generation. Keep ≥ 1 while a stream feeds the store: Structured
    * Streaming may replay its most recent epoch, whose report requires
    * `foldedBelow ≤ batchId` ([[meterStaged]] fails loudly otherwise).
    *
    * Commit protocol = the FingerprintStore shape: write the one-row
    * parquet under `gen_data_<n>/`, atomically rename the `gen_<n>`
    * marker (content = data subdir + foldedBelow), THEN delete the
    * previous generation and the folded segments. A crash anywhere
    * leaves a superset the reader cannot double-count (segments below
    * `foldedBelow` are excluded by id, stale generations by marker
    * ordering) and the next compaction reclaims.
    *
    * @return the new `foldedBelow` bound, or -1 if there was nothing
    *         to fold (no new generation committed).
    */
  def compact(
      s: org.apache.spark.sql.SparkSession,
      stateDir: String,
      keepNewestSegments: Int = 1): Long = {
    require(keepNewestSegments >= 0,
      "compact: keepNewestSegments must be >= 0")
    val p = new Path(stateDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prev = currentGen(s, stateDir)
    val prevBelow = prev.map(_._2).getOrElse(0L)
    val segs = committedSegments(s, stateDir)
      .filter(_._1 >= prevBelow)
      .dropRight(keepNewestSegments)
    if (segs.isEmpty) return -1L
    val foldedBelow = segs.map(_._1).max + 1
    val genNo = prev.map(_._3 + 1).getOrElse(1L)
    val dataSub = f"gen_data_$genNo%05d"
    val sources = prev.map(g => new Path(p, g._1).toString).toSeq ++
      segs.map(_._2)
    s.read.schema(segSchema).parquet(sources: _*)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_keep")).as("n_keep"),
        sum(col("nll_micro")).as("nll_micro"))
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(p, dataSub).toString)
    val tmp = new Path(p, f"gen_$genNo%05d.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$dataSub\t$foldedBelow".getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new Path(p, f"gen_$genNo%05d"))
    // cleanup strictly after the commit — all invisible to readers now
    prev.foreach { case (sub, _, n) =>
      fs.delete(new Path(p, f"gen_$n%05d"), false)
      fs.delete(new Path(p, sub), true): Unit
    }
    segs.foreach { case (_, path) => fs.delete(new Path(path), true): Unit }
    foldedBelow
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
    val gen = currentGen(s, stateDir)
    val foldedBelow = gen.map(_._2).getOrElse(0L)
    require(foldedBelow <= batchId,
      s"quality-meter compaction folded segments up to $foldedBelow, " +
        s"beyond this epoch $batchId — compact with " +
        "keepNewestSegments >= 1 while a stream feeds the store")
    val segs = gen.map(g => s"$stateDir/${g._1}").toSeq ++
      committedSegments(s, stateDir)
        .filter { case (id, _) => id >= foldedBelow && id <= batchId }
        .map(_._2)
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
    *
    * `compactEvery > 0` makes the meter SELF-MAINTAINING: after every
    * Nth epoch, [[compact]] folds the old one-row segments into the
    * generation (always `keepNewestSegments = 1`, the replay horizon),
    * so a stream that runs for months holds O(1) segments instead of
    * one per epoch since start. The fold runs AFTER the epoch's own
    * write, between epochs — exactly the single-writer window the
    * store contract requires — and is replay-invisible by the
    * `foldedBelow` read bound.
    */
  def monitor(
      stream: DataFrame,
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      textCol: String,
      idCol: String,
      model: LmScore.BigramLm,
      keepMaxMicroNll: Long,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        meterStaged(df, stateDir, textCol, idCol, model,
          keepMaxMicroNll, id)
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          compact(df.sparkSession, stateDir, keepNewestSegments = 1)
          purgeSuperseded(df.sparkSession, stateDir): Unit
        }
        ()
      }
      .start()

  /** GC of crash debris (stale generations, `gen_*.tmp`, segments
    * orphaned below `foldedBelow`) — see [[MeterGc.purgeSuperseded]].
    */
  def purgeSuperseded(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[String] =
    MeterGc.purgeSuperseded(s, dir, "seg_")
}
