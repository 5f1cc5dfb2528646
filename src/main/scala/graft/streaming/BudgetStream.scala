package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Streaming token-budget admission — q96's mixture quota run as an
  * INGEST policy instead of a ranking pass: documents arrive in order,
  * each source owns a token budget, and a doc is admitted iff its
  * source's meter has not yet filled when it arrives (`cum_before <
  * budget`; the meter counts every ARRIVED token, so the cutoff is a
  * pure prefix of the stream and replay-stable — a best-first policy is
  * the batch operator's job, not the stream's).
  *
  * Two implementations sharing the semantics:
  *  - [[admitStaged]]: the foreachBatch/sequential-ingest core with a
  *    PERSISTED per-source meter — state is (source, arrived_tokens)
  *    per batch, landed as immutable batch-id-keyed segments (the
  *    store-family protocol: `_SUCCESS`-gated, a replay overwrites its
  *    OWN segment and reads only strictly-older ones, so recomputing a
  *    batch is idempotent). The meter frame is |sources|-sized — it
  *    broadcasts; the only batch-sized work is one source-keyed window.
  *  - [[admissions]]: the live Structured-Streaming twin via
  *    flatMapGroupsWithState (state per source = one Long), for
  *    unbounded streams where micro-batch boundaries are not known in
  *    advance. Within a micro-batch each group is folded in doc_id
  *    order so both paths agree batch-for-batch.
  *
  * At 100 TB: state is bounded by |sources|, admission is map-side
  * except the per-source ordered window within one batch, and the
  * emitted decision stream is itself an auditable table (why was this
  * doc dropped? — `cum_before` says).
  */
object BudgetStream {

  final case class Arrival(doc_id: Long, source: String, n_tokens: Long)
  final case class Admission(
      doc_id: Long, source: String, n_tokens: Long,
      cum_before: Long, admitted: Boolean)

  /** Live stateful variant: one meter Long per source. */
  def admissions(arrivals: Dataset[Arrival], budget: Long): Dataset[Admission] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[Arrival], state: GroupState[Long]) =>
          var spent = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { a =>
            val adm = Admission(a.doc_id, src, a.n_tokens, spent, spent < budget)
            spent += a.n_tokens
            adm
          }
          state.update(spent)
          out.iterator
      }
  }

  /** Sequential-ingest core: admit `batch` against the persisted meter,
    * then land this batch's per-source arrivals as segment `batchId`.
    * Reads only segments with id < `batchId`, so a replay of batch k
    * (same data, same id) reproduces its decisions exactly.
    *
    * Materialization notes (r18 advisor):
    *  - the eager localCheckpoint below TRUNCATES LINEAGE — loss of an
    *    executor holding its blocks between this call and the caller's
    *    terminal action fails that action instead of recomputing.
    *    Streaming callers recover via idempotent batch replay (the
    *    store protocol above); a direct batch caller that cannot
    *    tolerate a hard failure should prefer reliable checkpointing.
    *  - the checkpoint blocks are reclaimed by the ContextCleaner once
    *    the returned frame is GC-unreachable (no deterministic release
    *    handle exists for localCheckpoint blocks); the blocks are
    *    micro-batch-sized, and a long-running stream sheds them as each
    *    batch's frame goes out of scope. Harnesses that chain many
    *    batches in one JVM (Bench) nudge reclamation with System.gc().
    */
  def admitStaged(
      batch: DataFrame,
      stateDir: String,
      textCol: String,
      idCol: String,
      srcCol: String,
      budget: Long,
      batchId: Long): DataFrame = {
    val decided = admissionFrame(
      batch, stateDir, textCol, idCol, srcCol, budget, batchId)
    // ONE execution of the batch chain per epoch: the decision frame's
    // lineage carries the batch's whole tokenization (and, under
    // CurationStream, the dedup semi-join + extract cache reads), and
    // TWO actions used to consume it — the meter write here and the
    // caller's decisions action — running that chain twice per batch.
    // Materialize the MICRO-BATCH-sized decision frame once and derive
    // the meter from it (per-source Σ n_tokens over decided rows ≡ the
    // old per-source Σ over arrivals — decided is one row per arrival).
    // localCheckpoint, not OperatorCaches.persisted: the r18 A/B
    // measured the cache-registry route at +3 jobs / +1 s on q102
    // (block-manager fill + registry churn), while the checkpoint is
    // the frame's only materialization and the caller's action reads
    // its blocks directly.
    val dec = decided.localCheckpoint(eager = true)
    // meter update: every arrived token counts, admitted or not
    dec.groupBy(col(srcCol)).agg(sum(col("n_tokens")).as("__spent"))
      .write.mode("overwrite").parquet(segPath(stateDir, batchId))
    dec
  }

  /** The LAZY admission plan [[admitStaged]] materializes: one
    * broadcast join of the |sources|-sized meter onto the arrivals plus
    * one source-keyed window — no batch-side exchange for state (plan
    * pinned by BudgetStreamSpec). Exposed so the plan stays assertable
    * past admitStaged's eager checkpoint.
    */
  private[graft] def admissionFrame(
      batch: DataFrame,
      stateDir: String,
      textCol: String,
      idCol: String,
      srcCol: String,
      budget: Long,
      batchId: Long): DataFrame = {
    val s = batch.sparkSession
    val nTok = size(filter(TextFunctions.tokens(col(textCol)),
      t => t =!= "")).cast("long")
    val arr = batch.select(col(idCol), col(srcCol),
      nTok.as("n_tokens"))
    val prior = loadSpent(s, stateDir, batchId, srcCol)
    val w = Window.partitionBy(col(srcCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    arr
      .join(broadcast(prior), Seq(srcCol), "left")
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) +
          coalesce(col("__spent"), lit(0L)))
      .select(col(idCol), col(srcCol), col("n_tokens"),
        col("cum_before"), (col("cum_before") < budget).as("admitted"))
  }

  /** foreachBatch adapter: decisions land in `outDir/batch=<id>/`,
    * overwrite mode, so a replayed epoch rewrites only itself.
    */
  /** `compactEvery > 0` makes the meter SELF-MAINTAINING (the
    * QualityStream.monitor discipline): after every Nth epoch,
    * [[compact]] folds old per-source segments into the generation,
    * always sparing the replay horizon (`keepNewestSegments = 1`),
    * then [[purgeSuperseded]] reclaims any crash debris a previous
    * compaction's post-commit cleanup never got to.
    */
  def sink(
      stateDir: String, outDir: String,
      textCol: String, idCol: String, srcCol: String,
      budget: Long, compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, id) => {
      admitStaged(batch, stateDir, textCol, idCol, srcCol, budget, id)
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
        compact(batch.sparkSession, stateDir, srcCol,
          keepNewestSegments = 1)
        purgeSuperseded(batch.sparkSession, stateDir): Unit
      }
    }

  /** GC of crash debris (stale generations, `gen_*.tmp`, segments
    * orphaned below `foldedBelow`) — see [[MeterGc.purgeSuperseded]].
    */
  def purgeSuperseded(s: SparkSession, dir: String): Seq[String] =
    MeterGc.purgeSuperseded(s, dir, "m_")

  private def segPath(dir: String, id: Long) = f"$dir/m_$id%05d"

  /** Newest committed generation: (dataSub, foldedBelow, genNo) — the
    * QualityStream marker protocol over per-source spent rows.
    */
  private def currentGen(
      s: SparkSession, dir: String): Option[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
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
            s"malformed budget-meter generation marker in $dir: " +
              other.mkString("\\t"))
        }
      }
  }

  /** Fold committed per-source meter segments (except the newest
    * `keepNewestSegments`) into ONE generation — one row per source,
    * spent summed — absorbing any previous generation. The
    * [[graft.streaming.QualityStream.compact]] contract exactly:
    * keep ≥ 1 while a stream feeds the store (a replayed epoch reads
    * strictly below itself and [[loadSpent]] fails loudly past the
    * bound); sum-safe under crashes because the reader drops segments
    * below `foldedBelow` by id, so half-deleted folds can never
    * double-count.
    *
    * @return the new `foldedBelow` bound, or -1 if nothing to fold.
    */
  def compact(
      s: SparkSession,
      dir: String,
      srcCol: String = "source",
      keepNewestSegments: Int = 1): Long = {
    require(keepNewestSegments >= 0,
      "compact: keepNewestSegments must be >= 0")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prev = currentGen(s, dir)
    val prevBelow = prev.map(_._2).getOrElse(0L)
    val segs = committedSegments(s, dir)
      .filter(_._1 >= prevBelow)
      .dropRight(keepNewestSegments)
    if (segs.isEmpty) return -1L
    val foldedBelow = segs.map(_._1).max + 1
    val genNo = prev.map(_._3 + 1).getOrElse(1L)
    val dataSub = f"gen_data_$genNo%05d"
    val sources = prev.map(g => new org.apache.hadoop.fs.Path(p, g._1)
      .toString).toSeq ++ segs.map(_._2)
    // file-count-BOUNDED generation write, not coalesce(1): one row per
    // SOURCE domain — millions at 100 TB — must not serialize through a
    // single write task (the FrontierStream.compact rationale verbatim;
    // local[32] layout unchanged: 32 shuffle partitions → 1 file).
    s.read.parquet(sources: _*)
      .groupBy(col(srcCol)).agg(sum(col("__spent")).as("__spent"))
      .coalesce(math.max(1, s.sessionState.conf.numShufflePartitions / 32))
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(p, dataSub).toString)
    val tmp = new org.apache.hadoop.fs.Path(p, f"gen_$genNo%05d.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$dataSub\t$foldedBelow".getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(p, f"gen_$genNo%05d"))
    prev.foreach { case (sub, _, n) =>
      fs.delete(new org.apache.hadoop.fs.Path(p, f"gen_$n%05d"), false)
      fs.delete(new org.apache.hadoop.fs.Path(p, sub), true): Unit
    }
    segs.foreach { case (_, path) =>
      fs.delete(new org.apache.hadoop.fs.Path(path), true): Unit
    }
    foldedBelow
  }

  private def committedSegments(
      s: SparkSession, dir: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("m_"))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(st => st.getPath.getName.stripPrefix("m_").toLong ->
        st.getPath.toString)
      .sortBy(_._1)
  }

  /** Per-source meter from the generation (if any) plus every committed
    * segment with id in `[foldedBelow, beforeId)` (pass Long.MaxValue
    * for "all of them"). Fails loudly if a compaction folded segments
    * at or beyond `beforeId` — a replay past the fold bound would
    * silently double-count itself otherwise.
    */
  def loadSpent(
      s: SparkSession, dir: String, beforeId: Long,
      srcCol: String = "source"): DataFrame = {
    val gen = currentGen(s, dir)
    val foldedBelow = gen.map(_._2).getOrElse(0L)
    require(foldedBelow <= beforeId,
      s"budget-meter compaction folded segments up to $foldedBelow, " +
        s"beyond the requested history bound $beforeId — compact with " +
        "keepNewestSegments >= 1 while a stream feeds the store")
    val segs = gen.map(g => s"$dir/${g._1}").toSeq ++
      committedSegments(s, dir)
        .filter { case (id, _) => id >= foldedBelow && id < beforeId }
        .map(_._2)
    if (segs.isEmpty)
      graft.util.Frames.emptyLocal(s,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(srcCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__spent",
            org.apache.spark.sql.types.LongType))))
    else s.read.parquet(segs: _*)
      .groupBy(col(srcCol)).agg(sum(col("__spent")).as("__spent"))
  }
}
