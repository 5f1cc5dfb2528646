package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** [[graft.operators.Robots]] — robots.txt compilation (RFC 9309 group
  * structure) and longest-prefix-wins verdicts.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robots = Seq(
    ("a.com",
      "# banner comment\r\n" +
        "User-agent: googlebot\nDisallow: /\n" + // non-* group: ignored
        "\n" +
        "User-agent: *\nUser-agent: legacybot\n" + // stacked agents
        "Disallow: /private/\nAllow: /private/ok/\n" +
        "Disallow: /tmp # trailing comment\n" +
        "Disallow:\n"), // empty value: no-op
    ("b.com", "User-agent: spider\nDisallow: /\n") // no * group at all
  ).toDF("domain", "txt")

  test("rules: group stacking, non-* groups ignored, comments/CRLF/empties") {
    val got = Robots.rules(robots, "domain", "txt")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .toSet
    assert(got == Set(
      ("a.com", false, "/private/"),
      ("a.com", true, "/private/ok/"),
      ("a.com", false, "/tmp")))
  }

  test("verdict: longest prefix wins, Allow beats Disallow on ties, defaults") {
    val urls = Seq(
      (1L, "https://www.a.com/private/x"), // disallowed
      (2L, "https://www.a.com/private/ok/x"), // deeper Allow wins
      (3L, "https://www.a.com/tmpfile"), // literal prefix match
      (4L, "https://www.a.com/open/x"), // no rule matches
      (5L, "https://www.b.com/anything"), // domain without a * group
      (6L, "https://no-robots.org/x"), // domain with no robots at all
      (7L, "not a url") // malformed: allowed (fails elsewhere)
    ).toDF("doc_id", "url")
    val v = Robots.verdict(urls, "url", "doc_id",
        Robots.rules(robots, "domain", "txt"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(3), Option(r.getString(4))))).toMap
    assert(v(1L) == ((false, Some("/private/"))))
    assert(v(2L) == ((true, Some("/private/ok/"))))
    assert(v(3L) == ((false, Some("/tmp"))))
    assert(v(4L) == ((true, None)))
    assert(v(5L) == ((true, None)))
    assert(v(6L) == ((true, None)))
    assert(v(7L) == ((true, None)))
    // exact-length tie: Allow wins (the least-restrictive rule)
    val tie = Seq(("t.com", "User-agent: *\nDisallow: /a/\nAllow: /a/\n"))
      .toDF("domain", "txt")
    val tv = Robots.verdict(
        Seq((1L, "https://t.com/a/x")).toDF("doc_id", "url"),
        "url", "doc_id", Robots.rules(tie, "domain", "txt"))
      .head()
    assert(tv.getBoolean(3) && tv.getString(4) == "/a/")
  }

  test("crawlDelays: ms precision, non-* ignored, max wins, garbage drops") {
    val rb = Seq(
      ("int.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
      ("frac.com", "User-agent: *\nCrawl-delay: 1.5\n"),
      ("other.com", "User-agent: googlebot\nCrawl-delay: 9\n\n" +
        "User-agent: *\nCrawl-delay: 0.25\n"),
      ("bad.com", "User-agent: *\nCrawl-delay: soon\n"),
      ("neg.com", "User-agent: *\nCrawl-delay: -1\n"),
      ("none.com", "User-agent: *\nDisallow: /x\n"),
      ("two.com", "User-agent: *\nCrawl-delay: 3\n# note\nCrawl-delay: 1\n")
    ).toDF("domain", "txt")
    val got = Robots.crawlDelays(rb, "domain", "txt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "int.com" -> 2000L, "frac.com" -> 1500L, "other.com" -> 250L,
      "two.com" -> 3000L))
  }

  test("crawl-delay lines end a user-agent stack (group boundary)") {
    // the delay belongs to googlebot's group; the second User-agent
    // must NOT stack onto it — so the * group has no delay
    val rb = Seq(("s.com",
      "User-agent: googlebot\nCrawl-delay: 5\nUser-agent: *\n" +
        "Disallow: /x\n")).toDF("domain", "txt")
    assert(Robots.crawlDelays(rb, "domain", "txt").count() === 0)
    // ...while the Disallow still lands in the * group
    val r = Robots.rules(rb, "domain", "txt").collect()
    assert(r.map(x => (x.getBoolean(1), x.getString(2))).toSet ===
      Set((false, "/x")))
  }

  test("sitemaps: cross-group, case, comments, malformed, duplicates") {
    val rb = Seq(
      ("a.com", "Sitemap: https://a.com/sm1.xml\nUser-agent: *\n" +
        "Disallow: /x\nSitemap: https://a.com/sm2.xml\n"),
      ("b.com", "User-agent: *\nsitemap: https://b.com/sm.xml # main\n"),
      ("c.com", "User-agent: *\nSitemap: not a url\nSitemap:\n"),
      ("d.com", "Sitemap: https://d.com/a.xml\nSitemap: https://d.com/a.xml\n")
    ).toDF("domain", "txt")
    val got = Robots.sitemaps(rb, "domain", "txt")
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got === Set(
      ("a.com", "https://a.com/sm1.xml", Some("https://a.com/sm1.xml")),
      ("a.com", "https://a.com/sm2.xml", Some("https://a.com/sm2.xml")),
      ("b.com", "https://b.com/sm.xml", Some("https://b.com/sm.xml")),
      ("c.com", "not a url", None),
      ("d.com", "https://d.com/a.xml", Some("https://d.com/a.xml"))))
  }

  test("verdict plan: broadcast equi-join by domain — the corpus never shuffles") {
    val urls = Seq((1L, "https://www.a.com/private/x"))
      .toDF("doc_id", "url")
    val plan = Robots.verdict(urls, "url", "doc_id",
        Robots.rules(robots, "domain", "txt"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
