package graft

/** [[graft.operators.Feeds.parse]]: RSS item / Atom entry extraction —
  * date edge cases, comment invisibility, rel token lists, NULL
  * degradation.
  */
class FeedsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(rows: (Long, String)*) =
    graft.operators.Feeds.parse(
      rows.toSeq.toDF("doc_id", "markup"), "markup", "doc_id")

  test("rss: entity unescape, RFC822 offsets and GMT, garbage date -> NULL ts") {
    val got = parse(
      (1L, "<rss><channel>" +
        "<item><link>https://a.com/x?a=1&amp;b=2</link>" +
        "<pubDate>Tue, 03 Feb 2026 08:30:00 +0100</pubDate></item>" +
        "<item><link>https://a.com/y</link>" +
        "<pubDate>Wed, 04 Feb 2026 12:00:00 GMT</pubDate></item>" +
        "<item><link>https://a.com/z</link>" +
        "<pubDate>next tuesday</pubDate></item>" +
        "</channel></rss>"))
      .collect().map(r => r.getAs[String]("url") ->
        Option(r.getAs[java.sql.Timestamp]("published_ts"))
          .map(_.toInstant.toString)).toMap
    assert(got("https://a.com/x?a=1&b=2") === Some("2026-02-03T07:30:00Z"))
    assert(got("https://a.com/y") === Some("2026-02-04T12:00:00Z"))
    assert(got("https://a.com/z") === None) // raw kept, ts NULL
  }

  test("atom: href entries, multi-token rel, ISO offsets, comments invisible") {
    val got = parse(
      (2L, "<feed>" +
        "<entry><link rel=\"alternate nofollow\" href=\"https://b.com/1\"/>" +
        "<updated>2026-02-03T08:30:00Z</updated></entry>" +
        "<!-- <entry><link href=\"https://ghost.com/\"/></entry> -->" +
        "<entry><link href='https://b.com/2'/>" +
        "<updated>2026-02-04T12:00:00+01:00</updated></entry>" +
        "</feed>"))
      .collect()
    assert(got.length === 2) // the commented-out entry never surfaces
    val byUrl = got.map(r => r.getAs[String]("url") ->
      (r.getLong(2), Option(r.getAs[java.sql.Timestamp]("published_ts"))
        .map(_.toInstant.toString))).toMap
    assert(byUrl("https://b.com/1") === ((0L, Some("2026-02-03T08:30:00Z"))))
    assert(byUrl("https://b.com/2") === ((1L, Some("2026-02-04T11:00:00Z"))))
  }

  test("NULL markup and linkless items emit nothing") {
    assert(parse((3L, null: String)).count() === 0L)
    assert(parse(
      (4L, "<rss><channel><item><guid>g</guid></item></channel></rss>"))
      .count() === 0L)
  }
}
