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
