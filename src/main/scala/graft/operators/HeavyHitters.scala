package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, MisraGriesAgg}

import graft.functions.TextFunctions

/** Sketch-then-verify heavy hitters: every token whose corpus frequency
  * strictly exceeds `n / phi`, with EXACT counts.
  *
  * Two passes over the exploded tokens, neither of which shuffles the
  * vocabulary:
  *
  *   1. CANDIDATES — one [[org.apache.spark.sql.graft.MisraGriesAgg]]
  *      sketch (k counters, k > phi so the Misra–Gries guarantee makes the
  *      candidate set a SUPERSET of the true heavy hitters) plus the total
  *      token count, folded map-side to ≤ k counters per partition before
  *      the single-row final merge. The candidate list is a bounded driver
  *      frame (≤ k rows).
  *   2. VERIFY — exact recount of candidate tokens only (broadcast IN
  *      filter; map-side combine ends the shuffle at ≤ k rows per
  *      partition), then the integer-exact threshold `tf * phi > n`.
  *
  * The sketch decides only WHICH tokens get recounted, never a published
  * number — false candidates die at the exact threshold, so the output is
  * byte-identical to the full-vocabulary groupBy it replaces while the
  * exchange is bounded by k instead of |vocabulary|. (Reference analogue:
  * none — extension for corpus curation; vocabulary pruning and
  * stopword-list induction at 100 TB.)
  */
object HeavyHitters {

  /** Raw sketch aggregate as a Column (exposed for specs). */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** `(tok, tf, n_tokens, per_100k)` for every token with
    * `tf * phi > n_tokens`, ordered (tf desc, tok).
    *
    * Cost shape — a DELIBERATE two-scan design: the tokenize+explode
    * runs twice (sketch pass, then exact recount of candidates). The
    * alternative — persisting the exploded token frame between passes —
    * caches a frame LARGER than the corpus itself (one row per token),
    * which at 100 TB spills to disk and reads back slower than the
    * second codegen'd scan-side tokenize; this repo also measured
    * `localCheckpoint` of a reused exploded view slower than re-running
    * the cheap scan (q101). Set `persistTokens = true` only when the
    * upstream `docs` plan is itself expensive (a heavy parse/join, not
    * a bare parquet scan) and the corpus fits the cluster's cache tier.
    */
  def tokenHeavyHitters(
      docs: DataFrame,
      textCol: String,
      phi: Int,
      k: Int,
      persistTokens: Boolean = false): DataFrame = {
    require(k > phi,
      s"sketch budget k=$k must exceed phi=$phi for the superset guarantee")
    val toksRaw = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
    val toks =
      if (persistTokens)
        toksRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else toksRaw
    try {
      val first = toks
        .agg(misraGries(col("tok"), k).as("cand"), count(lit(1)).as("n"))
        .first()
      val n = first.getLong(1)
      val candidates = first.getSeq[Row](0).map(_.getString(0))
      val out = toks
        .filter(col("tok").isInCollection(candidates))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"))
        .filter(col("tf") * phi > lit(n))
        .select(col("tok"), col("tf"), lit(n).as("n_tokens"),
          expr(s"(tf * 100000L) div ${n}L").as("per_100k"))
        .orderBy(col("tf").desc, col("tok"))
      if (persistTokens) {
        // materialize the bounded result before dropping the cache the
        // lazy plan still references
        import scala.jdk.CollectionConverters._
        docs.sparkSession.createDataFrame(
          out.collect().toSeq.asJava, out.schema)
      } else out
    } finally if (persistTokens) { toks.unpersist(); () }
  }
}
