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
