package graft

import org.apache.spark.sql.functions._

import graft.operators.Sitemaps

/** [[graft.operators.Sitemaps.parse]]: urlset extraction semantics —
  * entry positions, loc whitespace trim + `&amp;` decode +
  * canonicalization, W3C-datetime lastmod → DATE, priority → exact
  * DECIMAL, try-cast NULL on malformed values, comment invisibility,
  * and the emit-nothing contract for index files and non-sitemap docs.
  */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(rows: (Long, String)*) =
    Sitemaps.parse(rows.toSeq.toDF("doc_id", "markup"), "markup", "doc_id")
      .orderBy("doc_id", "entry_pos").collect()

  test("entries extract with trim, entity decode and canonicalization") {
    val rs = parse(1L ->
      ("""<?xml version="1.0"?><urlset>""" +
        """<url><loc> HTTP://WWW.Ex.COM:80/p/1?utm_source=m&amp;b=2&amp;a=1 </loc>""" +
        """<lastmod>2026-01-05T08:30:00Z</lastmod><priority>0.8</priority></url>""" +
        """<url><loc>https://ex.com/q?x=1</loc></url></urlset>"""))
    assert(rs.length === 2)
    val r0 = rs(0)
    assert(r0.getAs[Long]("entry_pos") === 0L)
    assert(r0.getAs[String]("loc") ===
      "HTTP://WWW.Ex.COM:80/p/1?utm_source=m&b=2&a=1")
    assert(r0.getAs[String]("url_canon") === "http://www.ex.com/p/1?a=1&b=2")
    assert(r0.getAs[String]("domain") === "ex.com")
    assert(r0.getAs[java.sql.Date]("lastmod").toString === "2026-01-05")
    assert(r0.getAs[java.math.BigDecimal]("priority")
      .compareTo(new java.math.BigDecimal("0.80")) === 0)
    val r1 = rs(1)
    assert(r1.getAs[Long]("entry_pos") === 1L)
    assert(r1.getAs[String]("lastmod_raw") === null)
    assert(r1.get(r1.fieldIndex("lastmod")) === null)
    assert(r1.get(r1.fieldIndex("priority")) === null)
  }

  test("malformed loc/lastmod/priority go NULL, row survives") {
    val rs = parse(2L ->
      ("""<urlset><url><loc>not a url</loc><lastmod>soon</lastmod>""" +
        """<priority>high</priority></url></urlset>"""))
    assert(rs.length === 1)
    val r = rs(0)
    assert(r.getAs[String]("loc") === "not a url")
    assert(r.get(r.fieldIndex("url_canon")) === null)
    assert(r.get(r.fieldIndex("domain")) === null)
    assert(r.getAs[String]("lastmod_raw") === "soon")
    assert(r.get(r.fieldIndex("lastmod")) === null)
    assert(r.get(r.fieldIndex("priority")) === null)
  }

  test("commented-out entries are invisible; positions stay dense") {
    val rs = parse(3L ->
      ("""<urlset><!-- <url><loc>https://ghost.ex.com/</loc></url> -->""" +
        """<url><loc>https://ex.com/a</loc></url></urlset>"""))
    assert(rs.map(_.getAs[String]("loc")).toSeq === Seq("https://ex.com/a"))
    assert(rs(0).getAs[Long]("entry_pos") === 0L)
  }

  test("parseIndex: sitemap pointers only; urlset docs emit nothing") {
    val rs = graft.operators.Sitemaps.parseIndex(Seq(
      1L -> ("""<sitemapindex><sitemap><loc> https://ex.com/sm1.xml """ +
        """</loc><lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>""" +
        """<!-- <sitemap><loc>https://ghost/x.xml</loc></sitemap> -->""" +
        """<sitemap><loc>not a url</loc></sitemap></sitemapindex>"""),
      2L -> """<urlset><url><loc>https://ex.com/p/1</loc></url></urlset>""")
      .toDF("doc_id", "markup"), "markup", "doc_id")
      .orderBy("doc_id", "entry_pos").collect()
    assert(rs.length === 2)
    assert(rs(0).getAs[String]("loc") === "https://ex.com/sm1.xml")
    assert(rs(0).getAs[String]("url_canon") === "https://ex.com/sm1.xml")
    assert(rs(0).getAs[java.sql.Date]("lastmod").toString === "2026-02-01")
    assert(rs(1).getAs[String]("loc") === "not a url")
    assert(rs(1).get(rs(1).fieldIndex("url_canon")) === null)
    // and the urlset parser ignores index files symmetrically
    assert(graft.operators.Sitemaps.parse(Seq(
      1L -> """<sitemapindex><sitemap><loc>https://x/sm.xml</loc></sitemap></sitemapindex>""")
      .toDF("doc_id", "markup"), "markup", "doc_id").count() === 0)
  }

  test("diff: new/gone/changed/unchanged; null lastmod is not absence") {
    import org.apache.spark.sql.functions.col
    val prev = Seq(("a", "2026-01-01"), ("b", "2026-01-02"),
      ("c", "2026-01-03"), ("d", null.asInstanceOf[String]))
      .toDF("url", "lm").select(col("url"), col("lm").cast("date").as("lm"))
    val cur = Seq(("b", "2026-01-05"), ("c", "2026-01-03"),
      ("d", null.asInstanceOf[String]), ("e", "2026-02-01"))
      .toDF("url", "lm").select(col("url"), col("lm").cast("date").as("lm"))
    val got = graft.operators.Sitemaps.diff(prev, cur, "url", "lm")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("a" -> "gone", "b" -> "changed", "c" -> "unchanged",
      "d" -> "unchanged", "e" -> "new"))
  }

  test("sitemapindex files and non-sitemap docs emit nothing") {
    val rs = parse(
      4L -> """<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc></sitemap></sitemapindex>""",
      5L -> "<html><body>Doc 5</body></html>",
      6L -> null.asInstanceOf[String])
    assert(rs.isEmpty)
  }

  test("recrawlPolicy: halve/double/clamp/floor-fallback/retire per branch") {
    import org.apache.spark.sql.functions.col
    val diffed = Seq(
      ("hot", "changed"), ("hotfloor", "changed"), ("nostore", "changed"),
      ("cool", "unchanged"), ("coolcap", "unchanged"),
      ("fresh", "new"), ("dead", "gone"))
      .toDF("url", "status")
    val iv = Seq(("hot", 8000000L), ("hotfloor", 4000000L),
      ("cool", 5000000L), ("coolcap", 9000000L), ("dead", 7000000L))
      .toDF("url", "interval_ms")
    val got = graft.operators.Sitemaps
      .recrawlPolicy(diffed, iv, "url", "interval_ms",
        minMs = 3600000L, maxMs = 14400000L)
      .collect()
      .map(r => r.getString(0) ->
        Option(r.get(r.fieldIndex("next_interval_ms")))
          .map(_.asInstanceOf[Long]))
      .toMap
    assert(got === Map(
      "hot" -> Some(4000000L), // halved
      "hotfloor" -> Some(3600000L), // halved then clamped up to min
      "nostore" -> Some(3600000L), // no prior: floor div 2 clamps to floor
      "cool" -> Some(10000000L), // doubled
      "coolcap" -> Some(14400000L), // doubled then clamped to max
      "fresh" -> Some(3600000L), // new starts at the floor
      "dead" -> None)) // retired
  }
}
