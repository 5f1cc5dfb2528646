package graft

import org.apache.spark.sql.functions._

import graft.operators.Html

/** [[graft.operators.Html.extractMain]] — boilerplate removal as pure
  * column expressions: script/style/comment payloads vanish, blocks
  * split on block-level tags, short and link-dense blocks drop, the
  * survivors reassemble in document order. Map-only (no shuffle).
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minChars: Int = 25,
      maxPct: Int = 33) =
    Html.extractMain(rows.toDF("doc_id", "markup"), "markup", "doc_id",
        minChars, maxPct)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("script/style/comment payloads never reach the text") {
    val page = "<html><head><style>body{color:red}</style>" +
      "<script>var secret = 'leaky javascript payload here';</script>" +
      "</head><body><!-- hidden comment text -->" +
      "<p>the visible article body with plenty of characters</p>" +
      "</body></html>"
    val got = run(Seq((1L, page)))
    assert(got(1L)._3 == "the visible article body with plenty of characters")
    assert(!got(1L)._3.contains("secret") && !got(1L)._3.contains("hidden"))
  }

  test("link-dense and short blocks drop; order and entities survive") {
    val page = "<body>" +
      "<nav><a href='/'>home</a> <a href='/a'>about</a></nav>" + // dense
      "<p>first real paragraph with enough visible characters</p>" +
      "<div><a href='/buy'>buy now great deals today friends</a></div>" + // long but 100% links
      "<p>second paragraph mentions Tom &amp; Jerry extensively</p>" +
      "<footer>short</footer></body>"
    val got = run(Seq((1L, page)))
    val (nBlocks, nKept, text) = got(1L)
    assert(nKept == 2L)
    assert(text == "first real paragraph with enough visible characters " +
      "second paragraph mentions Tom & Jerry extensively")
    assert(nBlocks >= 4L) // nav, both p, promo, footer all have text
    // a mixed block under the density bar SURVIVES: long text, one link
    val mixed = "<p>an article sentence that links <a href='/x'>here</a> " +
      "but keeps mostly prose around the anchor text</p>"
    assert(run(Seq((2L, mixed)))(2L)._2 == 1L)
  }

  test("one row per input doc; null/empty markup yields (0, 0, '')") {
    val got = Html.extractMain(
      Seq((1L, Option("<p>a paragraph long enough to clear the bar</p>")),
        (2L, Option.empty[String]), (3L, Option("")))
        .toDF("doc_id", "markup"), "markup", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == ((0L, 0L, "")) && got(3L) == ((0L, 0L, "")))
    assert(got(1L)._2 == 1L)
  }

  test("map-only: the plan carries no shuffle and no explode") {
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "markup")
    val plan = Html.extractMain(df, "markup", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan) // no explode amplification
  }

  test("extractLinks: hrefs both quote styles, entity anchors, comment strip, position gaps") {
    val markup =
      "<p><a href=\"https://a.example.com/x\">First &amp; best</a> " +
        "<a name=\"here\">anchor only</a> " +
        "<a href='https://b.example.com/y?q=1'>second <b>link</b></a> " +
        "<!-- <a href=\"https://ghost.example.com/\">gone</a> --></p>"
    val got = Html.extractLinks(
        Seq((1L, markup), (2L, "<p>no links at all</p>"), (3L, null))
          .toDF("doc_id", "markup"), "markup", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // the href-less anchor keeps position 1 (gap); the commented-out
    // anchor never appears; link-free and null docs emit nothing
    assert(got == Seq(
      (1L, 0L, "https://a.example.com/x", "First & best"),
      (1L, 2L, "https://b.example.com/y?q=1", "second link")))
  }

  test("extractLinks plan: one map-side Generate, no shuffle") {
    val plan = Html.extractLinks(
        Seq((1L, "<a href='/x'>x</a>")).toDF("doc_id", "markup"),
        "markup", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan)
  }

  test("thresholds are honored exactly at the boundary") {
    // 25 visible chars exactly -> kept at minTextChars=25
    val text25 = "abcde fghij klmno pqrst u" // 25 chars
    assert(text25.length == 25)
    val got = run(Seq((1L, s"<p>$text25</p>")))
    assert(got(1L)._2 == 1L)
    val got24 = run(Seq((1L, s"<p>${text25.dropRight(1)}</p>")))
    assert(got24(1L)._2 == 0L)
    // density exactly at 33%: 100 chars text with 33 anchor chars kept
    val prose = "a" * 67
    val link = "b" * 33
    val page = s"<p>$prose<a href='/x'>$link</a></p>"
    assert(run(Seq((1L, page)))(1L)._2 == 1L)
    val page34 = s"<p>${"a" * 66}<a href='/x'>${"b" * 34}</a></p>"
    assert(run(Seq((1L, page34)))(1L)._2 == 0L)
  }

  test("canonicalLink: both attribute orders, case, comments, none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<head><link rel=\"canonical\" href=\"https://a.com/x\"></head>"),
      (2L, "<head><LINK HREF='https://b.com/y' REL='canonical'></head>"),
      // stylesheet link is not canonical; commented-out canonical invisible
      (3L, "<head><link rel=\"stylesheet\" href=\"/s.css\">" +
        "<!-- <link rel=\"canonical\" href=\"https://ghost.com/\"> --></head>"),
      (4L, null: String)
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html.canonicalLink(docs, "markup", "doc_id")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("https://a.com/x"),
      2L -> Some("https://b.com/y"), 3L -> None, 4L -> None))
  }

  test("alternates: attr-order free, case, comments, rss drops, gaps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<head><link rel=\"stylesheet\" href=\"/s.css\">" + // pos 0
        "<link rel=\"alternate\" hreflang=\"en\" href=\"https://a.com/en\">" +
        "<LINK HREF='https://a.com/fr' HREFLANG='FR' REL='alternate'>" +
        "<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed\">" +
        "<!-- <link rel=\"alternate\" hreflang=\"zz\" href=\"https://g.com\"> -->" +
        "</head>"),
      (2L, null: String)
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html.alternates(docs, "markup", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    // stylesheet keeps position 0 but drops; rss alternate has no
    // hreflang and drops; commented-out alternate invisible
    assert(got === Set(
      (1L, 1L, "en", "https://a.com/en"),
      (1L, 2L, "fr", "https://a.com/fr")))
  }

  test("relLink: rel=next both orders, comments, rel guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<head><link rel=\"next\" href=\"https://a.com/2\"></head>"),
      (2L, "<head><LINK HREF='https://a.com/3' REL='next'></head>"),
      // prev is not next; commented-out next invisible
      (3L, "<head><link rel=\"prev\" href=\"https://a.com/1\">" +
        "<!-- <link rel=\"next\" href=\"https://ghost.com/\"> --></head>")
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html
      .relLink(docs, "markup", "doc_id", rel = "next", outCol = "nx")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("https://a.com/2"),
      2L -> Some("https://a.com/3"), 3L -> None))
    intercept[IllegalArgumentException] {
      graft.operators.Html.relLink(docs, "markup", "doc_id",
        rel = "next|.*", outCol = "nx")
    }
  }

  test("rel is a space-separated token list: multi-token rels still match") {
    import spark.implicits._
    val docs = Seq(
      // token anywhere in the list, either attribute order
      (1L, "<head><link rel=\"alternate nofollow\" hreflang=\"en\" " +
        "href=\"https://a.com/en\"></head>"),
      (2L, "<head><LINK HREF='https://a.com/fr' HREFLANG='fr' " +
        "REL='nofollow alternate'></head>"),
      // same-prefix DIFFERENT token must not match
      (3L, "<head><link rel=\"alternates\" hreflang=\"de\" " +
        "href=\"https://a.com/de\"></head>")
    ).toDF("doc_id", "markup")
    val alts = graft.operators.Html.alternates(docs, "markup", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(alts === Set((1L, "en"), (2L, "fr")))
    val next = Seq(
      (1L, "<head><link rel=\"next nofollow\" href=\"https://a.com/2\">" +
        "</head>"),
      (2L, "<head><link rel=\"nexts\" href=\"https://a.com/9\"></head>")
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html
      .relLink(next, "markup", "doc_id", rel = "next", outCol = "nx")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("https://a.com/2"), 2L -> None))
  }

  test("publishedDate: probe precedence, both orders, garbage, comments") {
    import spark.implicits._
    val docs = Seq(
      // meta article beats a present time tag
      (1L, "<head><meta property=\"article:published_time\" " +
        "content=\"2026-03-05T10:00:00Z\"></head>" +
        "<time datetime=\"2020-01-01\">old</time>"),
      // content-first shouting single-quoted ordering
      (2L, "<head><META CONTENT='2025-12-31' " +
        "PROPERTY='article:published_time'></head>"),
      // time tag alone; timezone suffix ignored by the 10-char cut
      (3L, "<p><time datetime=\"2024-06-30T08:00:00+01:00\">J</time></p>"),
      // legacy meta date, reversed attribute order
      (4L, "<head><meta content=\"2023-01-02\" name=\"date\"></head>"),
      // garbage: raw kept, DATE and age NULL
      (5L, "<head><meta name=\"date\" content=\"last tuesday\"></head>"),
      // commented out: invisible
      (6L, "<!-- <meta name=\"date\" content=\"1999-01-01\"> -->"),
      (7L, null: String)
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html
      .publishedDate(docs, "markup", "doc_id", asOf = "2026-08-01")
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getAs[java.sql.Date](2)).map(_.toString),
          Option(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    assert(got(1L) === ((Some("2026-03-05T10:00:00Z"), Some("2026-03-05"),
      Some("meta_article"), Some(149L))))
    assert(got(2L) === ((Some("2025-12-31"), Some("2025-12-31"),
      Some("meta_article"), Some(213L))))
    assert(got(3L) === ((Some("2024-06-30T08:00:00+01:00"),
      Some("2024-06-30"), Some("time_tag"), Some(762L))))
    assert(got(4L) === ((Some("2023-01-02"), Some("2023-01-02"),
      Some("meta_date"), Some(1307L))))
    assert(got(5L) === ((Some("last tuesday"), None, Some("meta_date"),
      None)))
    assert(got(6L) === ((None, None, None, None)))
    assert(got(7L) === ((None, None, None, None)))
  }

  test("metaRobots: both attribute orders, case, decoys, comments, none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<head><meta name=\"robots\" content=\"noindex, follow\"></head>"),
      (2L, "<head><META CONTENT='NOFOLLOW , NOINDEX' NAME='ROBOTS'></head>"),
      // decoys: description meta saying noindex, commented-out robots
      (3L, "<head><meta name=\"description\" content=\"noindex decoy\">" +
        "<!-- <meta name=\"robots\" content=\"noindex\"> --></head>"),
      (4L, "<head><meta name=\"robots\" content=\"index, follow\"></head>"),
      (5L, null: String)
    ).toDF("doc_id", "markup")
    val got = graft.operators.Html.metaRobots(docs, "markup", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((Some("noindex, follow"), true, false)))
    assert(got(2L) == ((Some("NOFOLLOW , NOINDEX"), true, true)))
    assert(got(3L) == ((None, false, false)))
    assert(got(4L) == ((Some("index, follow"), false, false)))
    assert(got(5L) == ((None, false, false)))
  }
}
