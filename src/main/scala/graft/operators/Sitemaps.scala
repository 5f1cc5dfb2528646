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
  val LocPattern = "(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>"
  val LastmodPattern = "(?is)<lastmod\\s*>\\s*(.*?)\\s*</lastmod\\s*>"
  val PriorityPattern = "(?is)<priority\\s*>\\s*(.*?)\\s*</priority\\s*>"

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
        expr("try_cast(substring(" +
          "regexp_extract(__e, '(?is)<lastmod\\\\s*>\\\\s*(.*?)\\\\s*" +
          "</lastmod\\\\s*>', 1), 1, 10) AS date)").as("lastmod"),
        expr("try_cast(" +
          "nullif(regexp_extract(__e, '(?is)<priority\\\\s*>\\\\s*(.*?)" +
          "\\\\s*</priority\\\\s*>', 1), '') AS decimal(3,2))")
          .as("priority"))
  }
}
