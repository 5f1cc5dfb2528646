package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerplate-removal stage every
  * web-crawl curation pipeline runs BEFORE any of the text operators
  * (the trafilatura / jusText / Readability stage, re-expressed as pure
  * column expressions): drop script/style/comment payloads, split the
  * markup into block-level segments, score each block by visible-text
  * length and LINK DENSITY (anchor-text chars per text char — the
  * jusText boilerplate signal), and reassemble the surviving blocks in
  * document order.
  *
  * Deterministic by construction: every step is a regex/string
  * transform from the RE2∩Java-safe subset (no lookarounds, no
  * backreferences — the q54 scrubPii discipline), so a SQL oracle can
  * replicate the extraction byte-for-byte and the result is a pure
  * function of the markup.
  *
  * Scale shape: MAP-ONLY — the block pipeline runs as higher-order
  * array functions (split → transform → zip_with → filter →
  * array_join) on the ingest scan, so a 100 TB crawl pays zero
  * shuffle and zero explode amplification; one output row per input
  * row, ready to feed dedup/quality/tokenize stages directly.
  *
  * One row per input document ([[Vocab.encode]]'s contract): a null or
  * block-free markup yields (0, 0, "").
  */
object Html {

  /** `<script ...>...</script>` including payload (RE2-safe: separate
    * patterns per tag — RE2 has no backreferences).
    */
  val ScriptPattern = "(?is)<script(\\s[^>]*)?>.*?</script\\s*>"
  val StylePattern = "(?is)<style(\\s[^>]*)?>.*?</style\\s*>"
  val CommentPattern = "(?s)<!--.*?-->"

  /** Block-level tag boundary (opening OR closing, with attributes):
    * the segmentation delimiter. Inline tags (`a`, `b`, `span`, …)
    * stay inside their block so anchor text can be measured.
    */
  val BlockSplitPattern =
    "(?i)</?(?:html|head|body|title|p|div|li|ul|ol|h[1-6]|t[dhr]|table" +
      "|section|article|header|footer|nav|blockquote|form|aside|main|br)" +
      "(\\s[^>]*)?/?>"

  /** Anchor inner markup, capture group 1. */
  val AnchorPattern = "(?is)<a(\\s[^>]*)?>(.*?)</a\\s*>"

  /** `rel` attribute matcher honoring HTML's space-separated token
    * list: `rel="alternate"`, `rel="alternate nofollow"`, and
    * `rel="nofollow alternate"` all carry the relation; `alternates`
    * (a different token sharing the prefix) does not.
    */
  private def relTokenPattern(rel: String): String =
    s"rel\\s*=\\s*[\"'](?:[^\"']*\\s)?$rel(?:\\s[^\"']*)?[\"']"

  /** Any remaining tag. */
  val TagPattern = "<[^>]*>"

  /** Visible text of a markup fragment: strip tags, decode the common
    * entities (amp LAST so `&amp;lt;` cannot double-decode), collapse
    * whitespace, trim. Shared verbatim by the oracle.
    */
  def visibleText(fragment: Column): Column = {
    val noTags = regexp_replace(fragment, TagPattern, " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Concatenated anchor text of a fragment (group 2 of
    * [[AnchorPattern]]), visible-text normalized — the link-density
    * numerator.
    */
  def anchorText(fragment: Column): Column =
    visibleText(array_join(
      regexp_extract_all(fragment, lit(AnchorPattern), lit(2)), " "))

  /** `href` attribute value of an anchor's attribute string: double-
    * quoted, else single-quoted (RE2∩Java-safe; unquoted hrefs are
    * out of scope by contract).
    */
  val HrefDqPattern = "(?i)href\\s*=\\s*\"([^\"]*)\""
  val HrefSqPattern = "(?i)href\\s*=\\s*'([^']*)'"

  /** Outlink extraction — the web-graph construction stage between
    * markup and [[Urls]]: one row per `<a href=…>` anchor,
    * (`idCol`, link_pos, href, anchor), `link_pos` the 0-based index in
    * the document's full anchor sequence (a dropped href-less anchor
    * keeps its position — indices can gap), `anchor` the visible-text-
    * normalized inner markup. Anchors without an href (named anchors)
    * drop;
    * documents without anchors emit nothing — this is an edge-list
    * extractor, not a document transform.
    *
    * Scale shape: one map-side explode whose output is proportional to
    * the corpus's LINK count; no shuffle. Feed the hrefs to
    * [[Urls.canonicalize]]/[[Urls.registeredDomain]] for graph keys,
    * then to [[Cluster]]/PageRank for the graph algorithms.
    *
    * @param carry extra source-row columns to keep on every emitted
    *   link row (e.g. the page's own domain) — carrying them through
    *   the explode is map-only, where attaching them afterwards costs
    *   a corpus-sized join back on `idCol` (two exchanges of the
    *   exploded link set; the r18 q154/q158 fold removed exactly that).
    */
  def extractLinks(
      docs: DataFrame,
      markupCol: String,
      idCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val cleaned = regexp_replace(
      coalesce(col(markupCol), lit("")), CommentPattern, " ")
    docs
      .select(col(idCol) +: carry.map(col) :+
        posexplode(regexp_extract_all(cleaned, lit(AnchorPattern), lit(0)))
          .as(Seq("link_pos", "__a")): _*)
      .select((col(idCol) +: carry.map(col)) ++ Seq(
        col("link_pos").cast("long").as("link_pos"),
        {
          val attrs = regexp_extract(col("__a"), AnchorPattern, 1)
          val dq = regexp_extract(attrs, HrefDqPattern, 1)
          val sq = regexp_extract(attrs, HrefSqPattern, 1)
          when(dq =!= "", dq).otherwise(sq).as("href")
        },
        visibleText(regexp_extract(col("__a"), AnchorPattern, 2))
          .as("anchor")): _*)
      .filter(col("href") =!= "")
  }

  /** `<meta name="robots" content="...">` directives — the crawl-policy
    * signal a curation pipeline must respect BEFORE a page enters the
    * corpus (a `noindex` page is the publisher saying "not training
    * data"; CommonCrawl and every serious crawl honor it). Attribute
    * order varies in the wild, so both `name=…content=…` and
    * `content=…name=…` orderings parse; matching is case-insensitive
    * on tag, attributes, and directive tokens. Output: (`idCol`,
    * [carry...], robots_content [NULL when no robots meta], noindex,
    * nofollow). Map-only — two regex probes per document, zero shuffle.
    *
    * @param carry extra source-row columns to keep on the output (the
    *   extractLinks discipline: carrying through a map-only projection
    *   is free, joining them back afterwards costs an exchange pair).
    */
  def metaRobots(
      docs: DataFrame,
      markupCol: String,
      idCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val m = regexp_replace(
      coalesce(col(markupCol), lit("")), CommentPattern, " ")
    val nameFirst = regexp_extract(m,
      "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']robots[\"'][^>]*" +
        "content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>", 1)
    val contentFirst = regexp_extract(m,
      "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*" +
        "name\\s*=\\s*[\"']robots[\"'][^>]*>", 1)
    val content = nullif(
      when(nameFirst =!= "", nameFirst).otherwise(contentFirst), lit(""))
    val toks = transform(split(lower(content), ","), t => trim(t))
    docs.select((col(idCol) +: carry.map(col)) ++ Seq(
      content.as("robots_content"),
      coalesce(array_contains(toks, "noindex"), lit(false)).as("noindex"),
      coalesce(array_contains(toks, "nofollow"), lit(false))
        .as("nofollow")): _*)
  }

  /** `<link rel="canonical" href="...">` — the publisher-declared
    * canonical URL, the dedup KEY signal that collapses mirror/AMP/
    * tracking-variant pages WITHOUT any content comparison (the first
    * thing a crawl dedup consults, before fingerprints). Attribute
    * order varies in the wild, so both `rel=…href=…` and `href=…rel=…`
    * parse, case-insensitively; commented-out links are invisible.
    * Output: (`idCol`, canonical_href — NULL when the page declares
    * none). Map-only: two regex probes per document.
    */
  def canonicalLink(
      docs: DataFrame,
      markupCol: String,
      idCol: String): DataFrame =
    relLink(docs, markupCol, idCol, rel = "canonical",
      outCol = "canonical_href")

  /** `<link rel="<rel>" href="...">` for any link relation — the shared
    * probe behind [[canonicalLink]] and the `rel=next` pagination
    * extraction: both attribute orders, case-insensitive, commented-out
    * links invisible, NULL when the page declares none. `rel` must be a
    * regex-safe literal token (canonical, next, prev, alternate) and is
    * matched as a TOKEN of the attribute value — HTML `rel` is a
    * space-separated token list, so `rel="alternate nofollow"` still
    * carries the alternate relation. Map-only: two regex probes per
    * document.
    */
  def relLink(
      docs: DataFrame,
      markupCol: String,
      idCol: String,
      rel: String,
      outCol: String): DataFrame = {
    require(rel.matches("[a-z-]+"), s"relLink: non-literal rel '$rel'")
    val m = regexp_replace(
      coalesce(col(markupCol), lit("")), CommentPattern, " ")
    val relAttr = relTokenPattern(rel)
    val relFirst = regexp_extract(m,
      s"(?is)<link\\s[^>]*$relAttr[^>]*" +
        "href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>", 1)
    val hrefFirst = regexp_extract(m,
      "(?is)<link\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*" +
        s"$relAttr[^>]*>", 1)
    docs.select(col(idCol),
      nullif(when(relFirst =!= "", relFirst).otherwise(hrefFirst),
        lit("")).as(outCol))
  }

  /** `<link rel="alternate" hreflang="…" href="…">` extraction — the
    * multilingual-variant map (Google's hreflang protocol): a page
    * lists its language variants and optionally an `x-default`, and a
    * curation pipeline groups the variants into ONE logical document
    * before per-language sampling (otherwise a 40-language site
    * contributes 40 near-identical pages to every mixture). One row
    * per hreflang-bearing alternate link: (`idCol`, alt_pos [0-based
    * index in the document's full `<link>` sequence — non-alternate
    * links keep their position, indices can gap], hreflang
    * [lowercased], href). Attribute order free; commented-out links
    * invisible; alternates without an hreflang (RSS feeds) are out of
    * scope and drop. Map-only: one explode over `<link>` tags.
    */
  def alternates(
      docs: DataFrame,
      markupCol: String,
      idCol: String): DataFrame = {
    val cleaned = regexp_replace(
      coalesce(col(markupCol), lit("")), CommentPattern, " ")
    val relAlt = "(?is)" + relTokenPattern("alternate")
    val hl = "(?is)hreflang\\s*=\\s*[\"']([^\"']*)[\"']"
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(cleaned,
          lit("(?is)<link\\s[^>]*>"), lit(0)))
          .as(Seq("alt_pos", "__t")))
      .filter(regexp_count(col("__t"), lit(relAlt)) > 0)
      .select(col(idCol), col("alt_pos").cast("long").as("alt_pos"),
        nullif(lower(regexp_extract(col("__t"), hl, 1)), lit(""))
          .as("hreflang"),
        {
          val dq = regexp_extract(col("__t"), HrefDqPattern, 1)
          val sq = regexp_extract(col("__t"), HrefSqPattern, 1)
          nullif(when(dq =!= "", dq).otherwise(sq), lit("")).as("href")
        })
      .filter(col("hreflang").isNotNull && col("href").isNotNull)
  }

  /** Publication-date extraction — the freshness signal a curation
    * pipeline cuts recency mixtures and staleness filters on (news/
    * blog corpora weight recent documents; a training-data card
    * reports corpus age). Probes in PRECEDENCE order, first hit wins:
    *
    *  1. `<meta property="article:published_time" content="…">` (the
    *     Open Graph article tag — the most reliable in the wild),
    *  2. `<time datetime="…">` (HTML5),
    *  3. `<meta name="date" content="…">` (legacy).
    *
    * Both attribute orderings parse for the meta probes,
    * case-insensitively; commented-out tags are invisible. The raw
    * value is kept verbatim; `published` is the try-cast DATE of its
    * first 10 chars (W3C datetimes lead with YYYY-MM-DD; garbage goes
    * NULL — the q146 discipline); `age_days` is the distance to
    * `asOf`. Map-only: four regex probes per document, zero shuffle.
    *
    * Output: (`idCol`, date_raw, published, date_source ∈
    * {meta_article, time_tag, meta_date, NULL}, age_days).
    */
  def publishedDate(
      docs: DataFrame,
      markupCol: String,
      idCol: String,
      asOf: String): DataFrame = {
    val m = regexp_replace(
      coalesce(col(markupCol), lit("")), CommentPattern, " ")
    def metaBy(attr: String, key: String): Column = {
      val keyFirst = regexp_extract(m,
        s"(?is)<meta\\s[^>]*$attr\\s*=\\s*[\"']$key[\"'][^>]*" +
          "content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>", 1)
      val contentFirst = regexp_extract(m,
        "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*" +
          s"$attr\\s*=\\s*[\"']$key[\"'][^>]*>", 1)
      when(keyFirst =!= "", keyFirst).otherwise(contentFirst)
    }
    val metaArticle = metaBy("property", "article:published_time")
    val timeTag = regexp_extract(m,
      "(?is)<time\\s[^>]*datetime\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>", 1)
    val metaDate = metaBy("name", "date")
    docs.select(col(idCol),
      when(metaArticle =!= "", metaArticle)
        .when(timeTag =!= "", timeTag)
        .when(metaDate =!= "", metaDate).as("date_raw"),
      when(metaArticle =!= "", lit("meta_article"))
        .when(timeTag =!= "", lit("time_tag"))
        .when(metaDate =!= "", lit("meta_date")).as("date_source"))
      .withColumn("published",
        expr("try_cast(substring(date_raw, 1, 10) AS date)"))
      .withColumn("age_days",
        datediff(lit(asOf).cast("date"), col("published")).cast("long"))
      .select(col(idCol), col("date_raw"), col("published"),
        col("date_source"), col("age_days"))
  }

  /** Main-content extraction over `markupCol`. A block SURVIVES when
    * its visible text has at least `minTextChars` characters AND its
    * link density (anchor chars · 100 / text chars) is at most
    * `maxLinkDensityPct` — the jusText short/link-heavy boilerplate
    * rule. Output: (`idCol`, [carry...], n_blocks [blocks with any
    * visible text], n_kept, main_text [kept blocks in document order,
    * joined with `blockSep`]). Pass `blockSep = "\n"` to keep block
    * boundaries as lines — the shape
    * [[Boilerplate.removeFrequentLines]] consumes (each kept block
    * becomes one candidate boilerplate line).
    *
    * @param carry extra source-row columns kept on the output (see
    *   [[extractLinks]] — map-only carry beats a join back).
    */
  def extractMain(
      docs: DataFrame,
      markupCol: String,
      idCol: String,
      minTextChars: Int = 25,
      maxLinkDensityPct: Int = 33,
      blockSep: String = " ",
      carry: Seq[String] = Nil): DataFrame = {
    require(minTextChars >= 1, "extractMain: minTextChars must be >= 1")
    require(maxLinkDensityPct >= 0 && maxLinkDensityPct <= 100,
      "extractMain: maxLinkDensityPct must be in [0, 100]")
    val cleaned = Seq(ScriptPattern, StylePattern, CommentPattern)
      .foldLeft(coalesce(col(markupCol), lit("")): Column) {
        (c, p) => regexp_replace(c, p, " ")
      }
    val blocks = split(cleaned, BlockSplitPattern)
    val btexts = transform(blocks, b => visibleText(b))
    val ltexts = transform(blocks, b => anchorText(b))
    // survivor text per block position, null where the block drops —
    // zip_with keeps document order without any explode/shuffle
    val kept = zip_with(btexts, ltexts, (t, l) =>
      when(length(t) >= minTextChars &&
        length(l) * 100 <= length(t) * maxLinkDensityPct, t))
    docs.select((col(idCol) +: carry.map(col)) ++ Seq(
      size(filter(btexts, t => length(t) > 0)).cast("long").as("n_blocks"),
      size(filter(kept, t => t.isNotNull)).cast("long").as("n_kept"),
      array_join(filter(kept, t => t.isNotNull), blockSep)
        .as("main_text")): _*)
  }
}
