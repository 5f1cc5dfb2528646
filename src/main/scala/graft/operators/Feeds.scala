package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the third URL-discovery source next
  * to sitemaps ([[Sitemaps]]) and robots `Sitemap:` pointers
  * ([[Robots.sitemaps]]): news/blog crawls poll feeds because they
  * surface NEW urls hours before sitemaps regenerate. Same regex
  * discipline as [[Sitemaps.parse]]: comments stripped first, entity
  * unescape on extracted urls, try-cast NULL semantics for garbage,
  * map-only explode — zero shuffle.
  *
  * Scope (documented, like the WET reader's): RSS 2.0 `<item>` blocks
  * (`<link>`, `<guid>`, `<pubDate>` in the RFC 822 shape
  * `EEE, dd MMM yyyy HH:mm:ss ±zzzz|GMT`) and Atom `<entry>` blocks
  * (`<link href="…">` picking the alternate/unqualified rel,
  * `<updated>` ISO-8601). English month/day abbreviations only — the
  * RFC 822 set; anything else keeps the raw string and a NULL
  * timestamp.
  */
object Feeds {

  private val ItemPattern = "(?is)<item\\s*>(.*?)</item\\s*>"
  private val EntryPattern = "(?is)<entry\\s*>(.*?)</entry\\s*>"
  private val LinkPattern = "(?is)<link\\s*>\\s*(.*?)\\s*</link\\s*>"
  private val GuidPattern =
    "(?is)<guid(?:\\s[^>]*)?>\\s*(.*?)\\s*</guid\\s*>"
  private val PubDatePattern =
    "(?is)<pubDate\\s*>\\s*(.*?)\\s*</pubDate\\s*>"
  private val UpdatedPattern =
    "(?is)<updated\\s*>\\s*(.*?)\\s*</updated\\s*>"
  // Atom <link> is an empty element with an href attribute; rel, when
  // present, must be the "alternate" token (HTML token-list lesson)
  private val AtomHrefPattern =
    "(?is)<link\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*/?>"

  /** One row per feed entry: (`idCol`, kind ∈ {rss, atom}, entry_pos,
    * url [entity-unescaped], url_canon, guid [rss only], date_raw,
    * published_ts [UTC timestamp; NULL for garbage]).
    */
  def parse(docs: DataFrame, markupCol: String, idCol: String): DataFrame = {
    val cleaned = regexp_replace(
      coalesce(col(markupCol), lit("")), Html.CommentPattern, " ")
    val rss = docs.select(col(idCol),
      lit("rss").as("kind"),
      posexplode(regexp_extract_all(cleaned, lit(ItemPattern), lit(1)))
        .as(Seq("entry_pos", "__e")))
      .select(col(idCol), col("kind"),
        col("entry_pos").cast("long").as("entry_pos"),
        regexp_extract(col("__e"), LinkPattern, 1).as("__url"),
        nullif(regexp_extract(col("__e"), GuidPattern, 1), lit(""))
          .as("guid"),
        nullif(regexp_extract(col("__e"), PubDatePattern, 1), lit(""))
          .as("date_raw"))
      // RFC 822: `Tue, 03 Feb 2026 08:30:00 +0000` (or GMT). The
      // optional weekday prefix is STRIPPED before parsing — Spark 3+
      // reserves pattern letter `E` for formatting only — and GMT
      // normalizes to +0000. try_to_timestamp so a malformed date
      // degrades to NULL instead of an ANSI abort (the
      // Wet.digitsToLong lesson).
      .withColumn("__d", regexp_replace(
        regexp_replace(col("date_raw"), "^[A-Za-z]{3},\\s*", ""),
        " GMT$", " +0000"))
      .withColumn("published_ts",
        expr("try_to_timestamp(__d, 'dd MMM yyyy HH:mm:ss Z')"))
      .drop("__d")
    val atom = docs.select(col(idCol),
      lit("atom").as("kind"),
      posexplode(regexp_extract_all(cleaned, lit(EntryPattern), lit(1)))
        .as(Seq("entry_pos", "__e")))
      .select(col(idCol), col("kind"),
        col("entry_pos").cast("long").as("entry_pos"),
        regexp_extract(col("__e"), AtomHrefPattern, 1).as("__url"),
        lit(null).cast("string").as("guid"),
        nullif(regexp_extract(col("__e"), UpdatedPattern, 1), lit(""))
          .as("date_raw"))
      .withColumn("published_ts",
        expr("try_to_timestamp(date_raw, " +
          "\"yyyy-MM-dd'T'HH:mm:ssXXX\")"))
    rss.unionByName(atom)
      .withColumn("url",
        nullif(regexp_replace(col("__url"), "&amp;", "&"), lit("")))
      .withColumn("url_canon", Urls.canonicalize(col("url")))
      .drop("__url")
      .filter(col("url").isNotNull)
      .select(col(idCol), col("kind"), col("entry_pos"), col("url"),
        col("url_canon"), col("guid"), col("date_raw"),
        col("published_ts"))
  }
}
