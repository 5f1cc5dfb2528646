package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the politeness stage between URL
  * discovery ([[Sitemaps]], [[Redirects]], the q149 link graph) and
  * fetching: a crawler may hit a host once per crawl-delay, so the
  * frontier is ordered into per-domain WAVES (wave w = the w-th fetch
  * from that domain, best-priority-first) and each URL gets a
  * deterministic earliest-fetch offset `eta_ms = (wave − 1) ×
  * crawl_delay(domain)`. Fetchers then stream the frontier in
  * (eta_ms, domain) order and politeness holds by construction.
  *
  * Scale shape: ONE domain-keyed window — and because the schedule is
  * depth-capped (`maxDepth`, the q135 discipline), the `row_number ≤ k`
  * filter compiles to a WindowGroupLimit: a mega-domain's millions of
  * URLs are pruned to the cap per partition BEFORE the exchange, so
  * domain skew cannot serialize onto one task's sort buffer. The
  * crawl-delay table is domain-sized and broadcasts.
  */
object Frontier {

  /** Retry schedule for failed fetches — the backoff plan a crawler
    * derives from fetch outcomes: retryable statuses (429 and the 5xx
    * transient family) get `maxAttempts` future attempts, attempt k
    * delayed by `max(Retry-After, base·2^(k−1))` capped at `capMs` —
    * the server's explicit `Retry-After` (RFC 9110 §10.2.3) is a FLOOR
    * under the exponential, never ignored. `eta_ms` is the cumulative
    * offset of attempt k from the failure. Non-retryable rows emit
    * nothing (a 404 is an answer, not an outage). All integer ms;
    * 2^(k−1) for k ≤ ~50 is exact in the double `pow` (the q136 ulp
    * argument, with integers exactly representable).
    *
    * Scale shape: map-side explode of `maxAttempts` rows per FAILED
    * fetch (failures are a sliver of a crawl log); the cumulative sum
    * windows over ≤ maxAttempts rows per url.
    */
  def retrySchedule(
      responses: DataFrame,
      urlCol: String,
      statusCol: String,
      retryAfterSecCol: String,
      maxAttempts: Int = 3,
      baseMs: Long = 1000L,
      capMs: Long = 60000L): DataFrame = {
    require(maxAttempts >= 1 && maxAttempts <= 50,
      s"retrySchedule: maxAttempts must be in [1,50], got $maxAttempts")
    val clash = Seq("attempt", "delay_ms", "eta_ms")
      .filter(responses.columns.contains)
    require(clash.isEmpty,
      s"Frontier.retrySchedule emits ${clash.mkString("/")} (output " +
        "contract); the input frame already has them — rename first")
    val retryable = col(statusCol).isin(429, 500, 502, 503, 504)
    val delay = least(
      greatest(coalesce(col(retryAfterSecCol) * 1000, lit(0L)),
        lit(baseMs) *
          expr("cast(pow(2, attempt - 1) AS bigint)")),
      lit(capMs))
    val w = Window.partitionBy(col(urlCol)).orderBy(col("attempt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    responses
      .filter(retryable)
      .select(col(urlCol), col(statusCol), col(retryAfterSecCol),
        explode(sequence(lit(1L), lit(maxAttempts.toLong)))
          .as("attempt"))
      .withColumn("delay_ms", delay.cast("long"))
      .withColumn("eta_ms", sum(col("delay_ms")).over(w))
      .drop(retryAfterSecCol)
  }

  /** Per-fetch inter-arrival gaps over a fetch log — the q176
    * politeness-audit core, with the domain window BOUNDED: a months-
    * long mega-domain fetch log must not serialize into one task's
    * window sort, so rows are bucketed by `usCol div bucketUs` (default
    * one day in µs) and the lag runs within (domain, bucket); each
    * bucket's FIRST row takes its gap from a boundary-carry frame —
    * one row per non-empty (domain, bucket) carrying the previous
    * non-empty bucket's last fetch time. Bit-identical to
    * `lag(us) over (domain ORDER BY us, id)` unbounded (the overall
    * first fetch of a domain keeps a NULL gap), but the big window's
    * partition is bounded by fetches-per-bucket (politeness itself
    * bounds it: ≤ bucketUs / crawl_delay rows) and the carry window
    * runs over the bucket-count-sized per-bucket frame, never the log.
    *
    * Output: input columns + `gap_us`.
    */
  def fetchGaps(
      log: DataFrame,
      domainCol: String,
      usCol: String,
      idCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, s"fetchGaps: bucketUs must be > 0, got $bucketUs")
    val clash = Seq("gap_us", "__bkt", "__prev_last")
      .filter(log.columns.contains)
    require(clash.isEmpty,
      s"Frontier.fetchGaps emits ${clash.mkString("/")} (output " +
        "contract / scratch); the input frame already has them — " +
        "rename first")
    val rows = log.withColumn("__bkt",
      expr(s"`$usCol` div ${bucketUs}L"))
    val wIn = Window.partitionBy(col(domainCol), col("__bkt"))
      .orderBy(col(usCol), col(idCol))
    val withIn = rows.withColumn("__gap_in",
      col(usCol) - lag(col(usCol), 1).over(wIn))
    val wB = Window.partitionBy(col(domainCol)).orderBy(col("__bkt"))
    val carry = rows.groupBy(col(domainCol), col("__bkt"))
      .agg(max(col(usCol)).as("__last"))
      .withColumn("__prev_last", lag(col("__last"), 1).over(wB))
      .select(col(domainCol), col("__bkt"), col("__prev_last"))
    withIn.join(carry, Seq(domainCol, "__bkt"), "left")
      .withColumn("gap_us",
        coalesce(col("__gap_in"), col(usCol) - col("__prev_last")))
      .drop("__bkt", "__gap_in", "__prev_last")
  }

  /** Max-min fair crawl-budget allocation (water-filling): given
    * per-domain page counts and a GLOBAL fetch budget, find the cap C
    * such that Σ min(n_d, C) exhausts the budget, and give every
    * domain `quota = min(n_d, C)` — small sites crawl fully, mega
    * sites split the remainder evenly. This is what q135/q155's fixed
    * per-domain caps cannot do: the cap FALLS OUT of the budget
    * instead of being guessed, so the budget is spent exactly (the
    * integer remainder goes +1 each to the lexicographically-first
    * capped domains — deterministic, oracle-replayable).
    *
    * All integer: closed form over the count frame sorted by
    * (n, domain) — a domain is fully satisfied iff
    * `n_j · (k − j + 1) + S_{j−1} ≤ B` (serving it fully costs no more
    * than its fair share at that level), the rest split `B − S_full`.
    *
    * Scale shape: every window here runs over the DOMAIN-COUNT-sized
    * frame (one row per domain — crawl metadata, not the corpus; the
    * robots rule-compilation precedent), and the two scalar attaches
    * are single-build-row broadcasts. The corpus never appears.
    *
    * Output: (domainCol, n_pages, satisfied, quota); Σ quota =
    * min(budget, Σ n_pages).
    */
  def budgetAllocate(
      counts: DataFrame,
      domainCol: String,
      nCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budgetAllocate: budget must be >= 0, got $budget")
    val base = counts.select(col(domainCol),
      col(nCol).cast("long").as("n_pages"))
    val w = Window.orderBy(col("n_pages"), col(domainCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = base
      .withColumn("__s", sum(col("n_pages")).over(w))
      .withColumn("__j", count(lit(1)).over(w))
    val k = ranked.agg(count(lit(1)).as("__k"))
    val flagged = ranked.crossJoin(broadcast(k))
      .withColumn("satisfied",
        col("n_pages") * (col("__k") - col("__j") + 1) +
          (col("__s") - col("n_pages")) <= budget)
    val fullAgg = flagged.agg(
      coalesce(sum(when(col("satisfied"), col("n_pages"))), lit(0L))
        .as("__sfull"),
      coalesce(sum(when(!col("satisfied"), 1L)), lit(0L)).as("__m"))
    val wCapped = Window.partitionBy(col("satisfied"))
      .orderBy(col(domainCol))
    flagged.crossJoin(broadcast(fullAgg))
      .withColumn("__cr", row_number().over(wCapped))
      .select(col(domainCol), col("n_pages"), col("satisfied"),
        when(col("satisfied"), col("n_pages"))
          .otherwise(
            expr(s"(${budget}L - __sfull) div __m") +
              when(col("__cr") <=
                expr(s"(${budget}L - __sfull) % __m"), 1L)
                .otherwise(0L))
          .as("quota"))
  }

  /** Schedule a frontier: (urlCol, domainCol, priorityCol carried
    * through) + (wave, delay_ms, eta_ms), waves 1-based best-first
    * (priority DESC, url ASC tiebreak), URLs beyond `maxDepth` waves
    * dropped (a crawl re-seeds the tail next cycle). `delays` maps
    * domain → delay_ms; unlisted domains get `defaultDelayMs`.
    */
  def schedule(
      frontier: DataFrame,
      urlCol: String,
      domainCol: String,
      priorityCol: String,
      delays: DataFrame,
      maxDepth: Int = 40,
      defaultDelayMs: Long = 1000L): DataFrame = {
    val clash = Seq("wave", "delay_ms", "eta_ms")
      .filter(frontier.columns.contains)
    require(clash.isEmpty,
      s"Frontier.schedule emits ${clash.mkString("/")} (output " +
        "contract); the input frame already has them — rename first")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    val d = delays.select(col("domain").as("__dd"),
      col("delay_ms").cast("long").as("__dm"))
    frontier
      .select(col(urlCol), col(domainCol), col(priorityCol))
      .withColumn("wave", row_number().over(w).cast("long"))
      .filter(col("wave") <= maxDepth)
      .join(broadcast(d), col(domainCol) === col("__dd"), "left")
      .select(col(urlCol), col(domainCol), col(priorityCol),
        col("wave"),
        coalesce(col("__dm"), lit(defaultDelayMs)).as("delay_ms"))
      .withColumn("eta_ms", (col("wave") - 1) * col("delay_ms"))
  }
}
