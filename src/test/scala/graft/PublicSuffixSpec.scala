package graft

import org.apache.spark.sql.functions._

import graft.operators.{PublicSuffix, Urls}

/** [[graft.operators.PublicSuffix]] — PSL-snapshot registered-domain
  * extraction: longest-suffix-wins, host-is-a-suffix → '', default
  * single-label rule = the two-label heuristic, and the divergence
  * from [[Urls.registeredDomain]] on ccSLD hosts.
  */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def psl(urls: String*): Seq[String] =
    urls.toDF("u").select(PublicSuffix.registeredDomain(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("ccSLD hosts key by registrant, not by the public suffix") {
    assert(psl(
      "https://www.shop.CO.UK/x", // 2-label suffix → last 3 labels
      "http://blog.evil.co.uk:80/p", // deep subdomain, same rule
      "https://foo.com.au/", // registrant directly under the suffix
      "https://a.b.c.ne.jp/x") == Seq(
      "shop.co.uk", "evil.co.uk", "foo.com.au", "c.ne.jp"))
    // the two-label heuristic conflates all of these into the suffix
    assert(Seq("https://www.shop.co.uk/x").toDF("u")
      .select(Urls.registeredDomain(col("u"))).head().getString(0)
      == "co.uk")
  }

  test("3-label suffixes (k12.ca.us, nsw.edu.au) take four labels") {
    assert(psl(
      "https://myschool.k12.ca.us/c",
      "https://www.some.school.nsw.edu.au/x") == Seq(
      "myschool.k12.ca.us", "school.nsw.edu.au"))
  }

  test("default rule: unlisted TLD keys as the last two labels") {
    assert(psl(
      "https://a.b.example.com/",
      "http://example.org",
      "https://deep.sub.example.dev/p") == Seq(
      "example.com", "example.org", "example.dev"))
  }

  test("no registrable part → '' (bare suffix, single label, garbage, IPv6)") {
    assert(psl(
      "https://co.uk/", // host IS a 2-label public suffix
      "https://k12.ca.us/", // host IS a 3-label public suffix
      "http://localhost/", // single label
      "not a url",
      "http://[::1]:8080/") == Seq("", "", "", "", ""))
  }

  test("longest suffix wins over a shorter one") {
    // ca.us is not in the snapshot as 2-label, but k12.ca.us is 3-label;
    // a host under both candidate windows must take the longest match
    assert(psl("https://x.y.k12.ca.us/") == Seq("y.k12.ca.us"))
  }
}
