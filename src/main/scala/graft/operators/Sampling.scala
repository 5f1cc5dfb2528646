package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic hash-based sampling — the reproducible way to cut
  * subsets, holdouts, and stratified mixtures from a 100 TB corpus.
  *
  * Unlike `df.sample()` (RNG per partition — resample on every retry,
  * repartition, or speculative re-execution), membership here is a pure
  * function of the row's stable key: keep iff
  * `hash(key ':' salt) mod 1e6 < perMillion`. Same rows selected on every
  * run, every engine, every partitioning; changing `salt` draws an
  * independent sample (e.g. train vs holdout). Map-only — the predicate is
  * a codegen'd scan-side filter, no shuffle, and composes with partition
  * pruning. The hash is the engine's md5-derived [[TextFunctions.stableHash60]]
  * (cross-engine reproducible, unlike murmur3 `hash()`).
  */
object Sampling {

  /** Per-row keep predicate: sampling bucket of `key` (0..999999). */
  def sampleBucket(key: Column, salt: String): Column =
    pmod(TextFunctions.stableHash60(
      concat(key.cast("string"), lit(":" + salt))), lit(1000000L))

  /** Keep rows whose bucket falls under `perMillion` (integer rate in
    * parts-per-million — integer thresholds avoid double-rounding skew
    * between engines). `perMillion` may be a per-row column for
    * stratified rates.
    */
  def hashSample(df: DataFrame, key: Column, perMillion: Column,
      salt: String = "graft"): DataFrame =
    df.filter(sampleBucket(key, salt) < perMillion)

  /** LEAKAGE-SAFE train/heldout split: the split key is a GROUP id
    * (near-duplicate cluster, url domain, conversation thread …), so
    * every member of a group lands on the same side — splitting by
    * document puts one copy of a near-dup pair in train and its twin in
    * the heldout set, and the heldout metric silently becomes a
    * memorization probe (the classic eval-leakage failure this
    * operator exists to prevent; pair it with
    * [[graft.operators.Cluster.connectedComponents]] over the near-dup
    * candidate graph, q52's shape). Deterministic: the side is a pure
    * function of (group, salt) via the same integer ppm bucket as
    * [[hashSample]] — re-runs, re-partitions, and other engines
    * reproduce it bit-for-bit.
    *
    * Map-only: one hash + one comparison per row; no shuffle beyond
    * whatever produced `groupCol`.
    */
  def groupSplit(
      df: DataFrame,
      groupCol: Column,
      trainPerMillion: Long,
      salt: String): DataFrame = {
    require(trainPerMillion >= 0 && trainPerMillion <= 1000000,
      "groupSplit: trainPerMillion must be in [0, 1000000]")
    df.withColumn("split",
      when(sampleBucket(groupCol, salt) < trainPerMillion, "train")
        .otherwise("heldout"))
  }

  /** EXACT-COUNT stratified sample: the k rows per group with the
    * smallest stable key hashes (tie-broken by key) — the deterministic
    * replacement for per-group reservoir sampling. Rate-based
    * [[hashSample]] gives each group a binomial-sized cut; this gives
    * exactly `min(k, |group|)` rows, reproducibly, which is what
    * fixed-size per-source eval/holdout sets need.
    *
    * Output contract: the input columns PLUS a `rk` LONG column — the
    * row's 1-based rank within its group (callers like q103 consume
    * it). Because `rk` is part of the output schema, an input frame
    * that already carries a `rk` column is rejected up front
    * (`require`) rather than silently overwritten.
    *
    * Scale shape: the `row_number <= k` window is rewritten by Spark
    * into a WindowGroupLimit — every map partition pre-truncates each
    * group to its top k BEFORE the exchange, so the shuffle carries at
    * most k × parts rows per group, never the group. (Spec-asserted on
    * the physical plan.)
    */
  def stratifiedTopK(
      df: DataFrame,
      key: Column,
      group: Column,
      k: Int,
      salt: String = "graft"): DataFrame = {
    require(!df.columns.contains("rk"),
      "stratifiedTopK emits a `rk` rank column (output contract); " +
        "the input frame already has one — rename it before calling")
    val h = TextFunctions.stableHash60(
      concat(key.cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(h.asc, key.asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-group DOCUMENT CAP ranked by a score — "keep at most `cap`
    * docs per domain, best first", the RefinedWeb/C4-style curation
    * step that bounds any one domain's share of the corpus (a handful
    * of mega-domains otherwise dominate a web crawl; a cap is the
    * absolute-count complement to the per-source PERCENTILE gate, which
    * cannot stop a huge domain from still contributing millions of
    * rows). Ranking is by `score` DESC with ties to the smaller
    * `tieKey` — fully deterministic given a deterministic score (pair
    * it with the exact-integer quality logit, the q87 discipline).
    *
    * Scale shape: one group-keyed exchange; the `row_number ≤ cap`
    * filter is recognized by Catalyst as a WindowGroupLimit, so every
    * map partition pre-truncates its groups to `cap` rows BEFORE the
    * shuffle — a mega-domain never travels whole (same economics as
    * [[stratifiedTopK]]).
    *
    * Output contract: input columns plus `rk` (LONG, 1-based rank
    * within the group); a pre-existing `rk` is rejected.
    */
  def groupCapByScore(
      df: DataFrame,
      group: Column,
      score: Column,
      tieKey: Column,
      cap: Int): DataFrame = {
    require(cap > 0, "groupCapByScore: cap must be positive")
    require(!df.columns.contains("rk"),
      "groupCapByScore emits a `rk` rank column (output contract); " +
        "the input frame already has one — rename it before calling")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(score.desc, tieKey.asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** TEMPERATURE-scaled source mixture — the T5/mC4 α-sampling shape:
    * source `i` contributes `kᵢ = ⌊budget × nᵢ^α / Σⱼ nⱼ^α⌋` documents
    * (α < 1 upweights small sources relative to proportional sampling —
    * the standard fix for a web crawl where one domain is 100× another),
    * and WHICH kᵢ documents is deterministic: the source's first kᵢ in
    * stable-hash order (salt-keyed, so a different salt draws an
    * independent mixture). Sampling is WITHOUT replacement: a source
    * whose quota exceeds its size contributes all of it (T5's
    * with-replacement repetition is the trainer's epoch concern — pair
    * with [[graft.operators.Layout.epochShuffle]]).
    *
    * Cross-engine exactness: the only transcendental is the weight
    * `nᵢ^α = exp(α·ln nᵢ)`, snapped to integer MICRO-units
    * (`round(·×1e6)` — a 1-ulp `exp`/`ln` divergence moves the product
    * ~1e-9 of the rounding boundary, the q136 micro-nat argument); the
    * quota division and the rank cut are 64-bit integer arithmetic, so
    * the selected set is bit-stable across engines and partitionings.
    *
    * Scale shape: weights/quotas live on the source-count frame (GROUP
    * cardinality — KBs) with the weight total attached as a broadcast
    * one-row frame (the q127 scalar discipline); the corpus pays one
    * source-keyed rank window (inherent to "first kᵢ per source") and a
    * broadcast quota join — no other shuffle.
    *
    * Output: the selected rows only — (`idCol`, `sourceCol`, rk, quota),
    * `rk` the 1-based hash rank within the source.
    */
  def temperatureSample(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      budget: Long,
      salt: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      "temperatureSample: alpha must be in (0, 1]")
    require(budget > 0, "temperatureSample: budget must be positive")
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wu",
        round(exp(log(col("__n").cast("double")) * alpha) * 1e6, 0)
          .cast("long"))
    val tot = counts.agg(sum(col("__wu")).as("__t"))
    // quota through DECIMAL(38,0): budget (up to ~1e18) times a
    // micro-unit weight (n^alpha * 1e6, ~3e10 at n=1e9, alpha=0.5)
    // overflows int64 silently under Spark's non-ANSI arithmetic —
    // exactly the corpus-scale regime this operator targets. The
    // decimal product is exact to 38 digits and `div` floor-divides
    // decimals back to BIGINT, so small-budget results are unchanged
    // and large-budget quotas can no longer wrap negative.
    val quotas = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        expr(s"(cast(${budget} as decimal(38,0)) * __wu) div __t")
          .as("quota"))
    val h = TextFunctions.stableHash60(
      concat(col(idCol).cast("string"), lit(s":$salt")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(h.asc, col(idCol).asc)
    docs.select(col(idCol), col(sourceCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("rk") <= col("quota"))
      .select(col(idCol), col(sourceCol), col("rk"), col("quota"))
  }

  /** Deterministic WEIGHTED sample: the k rows per group with the
    * smallest `hash div weight` — integer-arithmetic priority sampling
    * (the Duffield–Lund–Thorup priority-sample shape with the stable
    * 60-bit key hash standing in for the uniform draw). A row with
    * twice the weight halves its priority, so inclusion probability
    * grows ∝ weight while staying a PURE FUNCTION of (key, weight,
    * salt): reproducible across runs, partitionings, and engines, like
    * [[hashSample]]/[[stratifiedTopK]]. No floats anywhere — `div` is
    * exact 64-bit floor division on both engines, so no libm pow/log
    * (the classic exponential-key scheme) can diverge a gate hash.
    *
    * Output contract: the input columns PLUS `priority` (LONG,
    * hash div weight) and `rk` (LONG, 1-based rank within the group);
    * colliding input columns are rejected up front. Weights are
    * clamped to ≥ 1 (a zero/negative weight would divide-by-zero or
    * invert the ordering, not exclude the row — exclude explicitly
    * upstream instead). Scale shape: same map-side WindowGroupLimit
    * pre-truncation as [[stratifiedTopK]] — the shuffle never carries
    * a whole group.
    */
  def weightedPriorityTopK(
      df: DataFrame,
      key: Column,
      weight: Column,
      group: Column,
      k: Int,
      salt: String = "graft"): DataFrame = {
    Seq("rk", "priority").foreach { c =>
      require(!df.columns.contains(c),
        s"weightedPriorityTopK emits a `$c` column (output contract); " +
          "the input frame already has one — rename it before calling")
    }
    val h = TextFunctions.stableHash60(
      concat(key.cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("priority").asc, key.asc)
    df.withColumn("__wps_h", h)
      .withColumn("__wps_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("priority", expr("__wps_h div __wps_w"))
      .drop("__wps_h", "__wps_w")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
