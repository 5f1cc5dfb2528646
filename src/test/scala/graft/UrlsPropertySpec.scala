package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Urls

/** Property tests for [[graft.operators.Urls]]: host/port extraction
  * cross-checked against `java.net.URI` (the public reference parser)
  * over generated well-formed URLs, plus canonicalization idempotence —
  * the property a dedup KEY must have (canon of a canon is itself).
  */
class UrlsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val label: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('-')))
    l <- Gen.alphaLowerChar
  } yield (h +: t :+ l).mkString

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "ftp")
    user <- Gen.option(label)
    pass <- Gen.option(label)
    nLabels <- Gen.chooseNum(2, 4)
    labels <- Gen.listOfN(nLabels, label)
    port <- Gen.option(Gen.chooseNum(1, 65535))
    nSegs <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(nSegs, label)
    params <- Gen.listOf(Gen.zip(
      Gen.oneOf("a", "b", "zz", "utm_source", "gclid", "page"), label))
    frag <- Gen.option(label)
  } yield {
    val userinfo = user.map(u => pass.fold(u)(p => s"$u:$p") + "@").getOrElse("")
    val host = labels.mkString(".")
    val portPart = port.map(p => s":$p").getOrElse("")
    val path = segs.map("/" + _).mkString
    val query =
      if (params.isEmpty) ""
      else "?" + params.map { case (k, v) => s"$k=$v" }.mkString("&")
    val fragment = frag.map("#" + _).getOrElse("")
    s"$scheme://$userinfo$host$portPart$path$query$fragment"
  }

  test("hostOf / registeredDomain match java.net.URI over generated URLs") {
    val urls = Gen.listOfN(300, urlGen).sample.getOrElse(Nil).distinct
    val got = urls.toDF("u")
      .select(col("u"), Urls.hostOf(col("u")).as("h"),
        Urls.registeredDomain(col("u")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.foreach { case (u, h, d) =>
      val uri = new java.net.URI(u)
      assert(h == uri.getHost.toLowerCase, s"host of $u")
      val want = uri.getHost.toLowerCase.split("\\.").takeRight(2).mkString(".")
      assert(d == want, s"domain of $u")
    }
  }

  test("canonicalize is idempotent and a pure function of URL identity") {
    val urls = Gen.listOfN(300, urlGen).sample.getOrElse(Nil).distinct
    val rows = urls.toDF("u")
      .select(col("u"), Urls.canonicalize(col("u")).as("c1"))
      .select(col("u"), col("c1"),
        Urls.canonicalize(col("c1")).as("c2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows.foreach { case (u, c1, c2) =>
      assert(c1 != null, s"well-formed URL must canonicalize: $u")
      assert(c1 == c2, s"canon not idempotent for $u: $c1 -> $c2")
      // no credential survives into the key
      assert(!c1.contains("@"), s"userinfo leaked into canon of $u")
      // no fragment survives
      assert(!c1.contains("#"), s"fragment leaked into canon of $u")
      // tracking keys never survive
      assert(!c1.contains("utm_") && !c1.contains("gclid="), s"tracker in $c1")
    }
  }

  test("bracketed IPv6 authorities canonicalize to NULL, never a '[' key") {
    // the documented unsupported shape: all of these must go NULL (like
    // malformed input), not conflate into one garbage "http://[..." key
    val v6 = Seq(
      "http://[::1]:8080/",
      "http://[::1]/x",
      "https://[2001:db8::1]/p?a=1",
      "http://user:pw@[2001:db8::2]:9090/q",
      "HTTP://[FE80::1%25eth0]:80/r")
    val got = v6.toDF("u").select(
        Urls.canonicalize(col("u")).as("c"),
        Urls.hostOf(col("u")).as("h"),
        nullif(Urls.registeredDomain(col("u")), lit("")).as("d"))
      .collect()
    got.zip(v6).foreach { case (r, u) =>
      assert(r.isNullAt(0), s"canon of $u must be NULL, got ${r.get(0)}")
      assert(r.getString(1) == "", s"hostOf $u must be ''")
      assert(r.isNullAt(2), s"registeredDomain of $u must be NULL")
    }
  }

  test("dropKeys is a parameter: 'ref' survives by default, drops on request") {
    val u = "https://example.com/p?ref=main&id=3"
    val row = Seq(u).toDF("u").select(
        Urls.canonicalize(col("u")).as("dflt"),
        Urls.canonicalize(col("u"),
          Urls.TrackingKeys :+ "ref").as("wide"))
      .head()
    assert(row.getString(0) == "https://example.com/p?id=3&ref=main")
    assert(row.getString(1) == "https://example.com/p?id=3")
  }
}
