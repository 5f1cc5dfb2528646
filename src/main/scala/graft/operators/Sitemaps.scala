package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap (sitemaps.org XML) extraction — the crawl-frontier SEED
  * stage: publishers enumerate their canonical URLs (plus freshness
  * hints) in `sitemap.xml`, and a crawler merges those entries into the
  * frontier before any page is fetched. One row per `<url>` block of a
  * `<urlset>` document: location (raw + [[Urls.canonicalize]]d +
  * registered domain), `lastmod` (raw W3C datetime + best-effort DATE),
  * and `priority` (exact DECIMAL(3,2), NULL when absent or malformed —
  * try-cast semantics, the q146 malformed-goes-NULL discipline).
  *
  * Scope (documented, spec-pinned): `<urlset>`/`<url>` documents;
  * `<sitemapindex>`/`<sitemap>` pointer files are frontier metadata,
  * not URL entries, and emit nothing. Entity decoding covers `&amp;` —
  * the one entity the sitemap protocol REQUIRES escaping in a `<loc>`.
  * XML comments are invisible (the [[Html.CommentPattern]] strip).
  *
  * Scale shape: MAP-ONLY — one regex explode proportional to the
  * corpus's sitemap-entry count, zero shuffle; every probe is from the
  * RE2∩Java-safe subset so a SQL oracle replicates byte-for-byte.
  * Documents without `<url>` blocks emit nothing (edge-list extractor
  * contract, [[Html.extractLinks]]).
  */
object Sitemaps {

  val UrlBlockPattern = "(?is)<url\\s*>(.*?)</url\\s*>"
  val SitemapBlockPattern = "(?is)<sitemap\\s*>(.*?)</sitemap\\s*>"
  val LocPattern = "(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>"
  val LastmodPattern = "(?is)<lastmod\\s*>\\s*(.*?)\\s*</lastmod\\s*>"
  val PriorityPattern = "(?is)<priority\\s*>\\s*(.*?)\\s*</priority\\s*>"

  /** `<sitemapindex>` pointer-file extraction — the level ABOVE
    * [[parse]]: large sites shard their URL inventory across child
    * sitemaps and publish one index of `<sitemap><loc>` pointers
    * (sitemaps.org caps a single file at 50 000 URLs, so any serious
    * site has an index). One row per `<sitemap>` block: (`idCol`,
    * entry_pos, loc, url_canon, domain, lastmod_raw, lastmod) — the
    * same probe semantics as [[parse]] minus `priority` (indexes don't
    * carry one). `<urlset>` documents emit nothing here, and index
    * documents emit nothing from [[parse]] — the two levels compose by
    * joining a child pointer's canonical URL to the child document's
    * fetch URL. Map-only.
    */
  def parseIndex(
      docs: DataFrame,
      markupCol: String,
      idCol: String): DataFrame = {
    val cleaned = regexp_replace(
      coalesce(col(markupCol), lit("")), Html.CommentPattern, " ")
    val loc = regexp_replace(
      regexp_extract(col("__e"), LocPattern, 1), "&amp;", "&")
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(cleaned,
          lit(SitemapBlockPattern), lit(1)))
          .as(Seq("entry_pos", "__e")))
      .select(col(idCol),
        col("entry_pos").cast("long").as("entry_pos"),
        nullif(loc, lit("")).as("loc"),
        Urls.canonicalize(loc).as("url_canon"),
        nullif(Urls.registeredDomain(loc), lit("")).as("domain"),
        nullif(regexp_extract(col("__e"), LastmodPattern, 1), lit(""))
          .as("lastmod_raw"))
      .withColumn("lastmod", expr(
        "try_cast(substring(coalesce(lastmod_raw, ''), 1, 10) AS date)"))
  }

  /** Snapshot diff — the incremental-recrawl planner: comparing the
    * previous crawl's sitemap snapshot with the current one yields the
    * work list (fetch `new` and `changed`, retire `gone`, skip
    * `unchanged`) without touching a single page. Presence is decided
    * by ROW presence (marker columns through the full-outer join), so
    * a NULL lastmod on a present row is still `unchanged`/`changed`
    * by null-safe comparison, never misread as absence.
    *
    * Scale shape: one url-keyed full-outer join between two
    * sitemap-entry-sized tables (both orders of magnitude below the
    * corpus); AQE picks broadcast when one snapshot is small.
    *
    * Output: (url, lastmod_prev, lastmod_cur,
    * status ∈ {new, gone, changed, unchanged}).
    */
  def diff(
      prev: DataFrame,
      cur: DataFrame,
      urlCol: String,
      lastmodCol: String): DataFrame = {
    val p = prev.select(col(urlCol).as("url"),
      col(lastmodCol).as("lastmod_prev"), lit(true).as("__p"))
    val c = cur.select(col(urlCol).as("url"),
      col(lastmodCol).as("lastmod_cur"), lit(true).as("__c"))
    p.join(c, Seq("url"), "full_outer")
      .select(col("url"), col("lastmod_prev"), col("lastmod_cur"),
        when(col("__p").isNull, lit("new"))
          .when(col("__c").isNull, lit("gone"))
          .when(!(col("lastmod_prev") <=> col("lastmod_cur")),
            lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Adaptive recrawl-interval policy over a [[diff]] result — the
    * classic multiplicative rule (Cho & Garcia-Molina's freshness
    * work): a page that CHANGED since the last visit halves its
    * recrawl interval (it is hotter than we thought), an `unchanged`
    * page doubles it (cooler), both clamped to [minMs, maxMs]; a `new`
    * page starts at minMs (nothing known — visit soon), a `gone` page
    * emits NULL (retired from the schedule). All-integer milliseconds
    * (`div 2`, `* 2`, clamp — no float decay constants), so the policy
    * replays bit-identically in any engine.
    *
    * `intervals` maps url → the CURRENT interval_ms; diff rows without
    * one (first sighting of a pre-existing url, a crash-lost row) fall
    * back to minMs — the conservative direction for freshness.
    *
    * Scale shape: one url-keyed equi-join between the diff (sitemap-
    * entry-sized) and the interval store, map-only arithmetic after.
    *
    * Output: (url, status, interval_ms [the prior], next_interval_ms).
    */
  def recrawlPolicy(
      diffed: DataFrame,
      intervals: DataFrame,
      urlCol: String,
      intervalCol: String,
      minMs: Long = 3600000L,
      maxMs: Long = 2592000000L): DataFrame = {
    require(minMs >= 1 && maxMs >= minMs,
      s"recrawlPolicy: need 1 <= minMs <= maxMs, got $minMs/$maxMs")
    val iv = intervals.select(col(urlCol).as("url"),
      col(intervalCol).cast("long").as("interval_ms"))
    val prior = coalesce(col("interval_ms"), lit(minMs))
    val halved = expr(s"coalesce(interval_ms, ${minMs}L) div 2")
    diffed.join(iv, Seq("url"), "left")
      .select(col("url"), col("status"), col("interval_ms"),
        when(col("status") === "gone", lit(null).cast("long"))
          .when(col("status") === "new", lit(minMs))
          .when(col("status") === "changed",
            greatest(halved, lit(minMs)))
          .otherwise(least(prior * 2, lit(maxMs)))
          .as("next_interval_ms"))
  }

  /** One row per `<url>` entry: (`idCol`, entry_pos, loc, url_canon,
    * domain, lastmod_raw, lastmod, priority).
    */
  def parse(docs: DataFrame, markupCol: String, idCol: String): DataFrame = {
    val cleaned = regexp_replace(
      coalesce(col(markupCol), lit("")), Html.CommentPattern, " ")
    val loc = regexp_replace(
      regexp_extract(col("__e"), LocPattern, 1), "&amp;", "&")
    val lastmodRaw = nullif(
      regexp_extract(col("__e"), LastmodPattern, 1), lit(""))
    val priorityRaw = nullif(
      regexp_extract(col("__e"), PriorityPattern, 1), lit(""))
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(cleaned, lit(UrlBlockPattern), lit(1)))
          .as(Seq("entry_pos", "__e")))
      .select(col(idCol),
        col("entry_pos").cast("long").as("entry_pos"),
        nullif(loc, lit("")).as("loc"),
        Urls.canonicalize(loc).as("url_canon"),
        nullif(Urls.registeredDomain(loc), lit("")).as("domain"),
        lastmodRaw.as("lastmod_raw"),
        priorityRaw.as("__priority_raw"))
      // derive from the ALREADY-extracted raw columns — re-running the
      // probe regex inside the cast doubled the regex work per entry
      // and duplicated the pattern text
      .withColumn("lastmod", expr(
        "try_cast(substring(coalesce(lastmod_raw, ''), 1, 10) AS date)"))
      .withColumn("priority",
        expr("try_cast(__priority_raw AS decimal(3,2))"))
      .drop("__priority_raw")
  }
}
