package graft

import org.apache.spark.sql.functions._

import graft.io.Wet

/** [[graft.io.Wet]] — WARC/WET record framing: round-trip fidelity,
  * split-boundary safety, and visible (never silent) corruption.
  */
class WetSpec extends SparkSpec {
  import spark.implicits._

  private def collectRows(df: org.apache.spark.sql.DataFrame) = df
    .select("warc_type", "target_uri", "content_length", "payload",
      "length_ok")
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getString(3), r.getBoolean(4)))
    .sortBy(_._2).toSeq

  test("round-trip: multi-line payloads and an inline WARC/1.0 token survive") {
    val docs = Seq(
      (1L, "hello world\nsecond line"),
      (2L, "mentions WARC/1.0 inline and keeps going"),
      (3L, "plain")).toDF("doc_id", "text")
      .withColumn("uri", concat(lit("https://ex.com/doc/"), col("doc_id")))
    val dir = tmpDir("wet-rt")
    Wet.toRecords(docs, "text", "uri").coalesce(1)
      .write.mode("overwrite").option("lineSep", Wet.RecordSeparator)
      .text(dir)
    val got = collectRows(Wet.read(spark, dir))
    val want = docs.collect()
      .map(r => ("conversion", r.getString(2),
        r.getString(1).getBytes("UTF-8").length.toLong, r.getString(1),
        true))
      .sortBy(_._2).toSeq
    assert(got == want)
  }

  test("a NULL text/uri document exports as a diagnosable empty record") {
    // concat-nulling the whole rec row would abort (or silently skip) a
    // corpus export on one bad document — NULLs must coalesce to ''
    val docs = Seq(
      (1L, "real payload", "https://ex.com/doc/1"),
      (2L, null, "https://ex.com/doc/2"), // null text
      (3L, "orphan payload", null) // null uri
    ).toDF("doc_id", "text", "uri")
    val recs = Wet.toRecords(docs, "text", "uri")
    assert(recs.filter(col("rec").isNull).count() == 0,
      "no NULL rec rows — a text sink would reject them")
    val dir = tmpDir("wet-null")
    recs.coalesce(1).write.mode("overwrite")
      .option("lineSep", Wet.RecordSeparator).text(dir)
    val got = collectRows(Wet.read(spark, dir))
    assert(got.size == 3)
    assert(got.forall(_._5), "coalesced records must still be length_ok")
    assert(got.exists(r => r._2 == "https://ex.com/doc/2" && r._4 == ""),
      "null text reads back as an empty payload")
    assert(got.exists(r => r._2 == "" && r._4 == "orphan payload"),
      "null uri reads back as an empty target_uri")
  }

  test("records straddling input-split boundaries are never torn") {
    val docs = (1 to 200).map(i =>
      (i.toLong, ("x" * 50) + s" doc $i payload\nline two of $i"))
      .toDF("doc_id", "text")
      .withColumn("uri",
        concat(lit("https://ex.com/d/"), format_string("%03d", col("doc_id"))))
    val dir = tmpDir("wet-split")
    Wet.toRecords(docs, "text", "uri").coalesce(1)
      .write.mode("overwrite").option("lineSep", Wet.RecordSeparator)
      .text(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val before = hconf.get("mapreduce.input.fileinputformat.split.maxsize")
    hconf.set("mapreduce.input.fileinputformat.split.maxsize", "512")
    try {
      val df = Wet.read(spark, dir)
      assert(df.rdd.getNumPartitions > 5, "tiny splits should fan out")
      val got = collectRows(df)
      assert(got.size == 200)
      assert(got.forall(_._5), "every straddled record must re-assemble")
      assert(got.map(_._2) ==
        (1 to 200).map(i => f"https://ex.com/d/$i%03d"))
    } finally {
      if (before == null)
        hconf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else hconf.set("mapreduce.input.fileinputformat.split.maxsize", before)
    }
  }

  test("gzipped .wet.gz files read transparently (the CommonCrawl layout)") {
    val dir = tmpDir("wet-gz")
    val recs = (1 to 5).map { i =>
      s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: https://ex.com/z/$i\r\nContent-Length: " +
        s"${s"payload $i".getBytes("UTF-8").length}\r\n\r\npayload $i"
    }
    val file = new java.io.File(dir, "part.wet.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(file))
    try out.write(recs.mkString(Wet.RecordSeparator).getBytes("UTF-8"))
    finally out.close()
    val got = collectRows(Wet.read(spark, dir))
    assert(got.size == 5 && got.forall(_._5))
    assert(got.map(_._4) == (1 to 5).map(i => s"payload $i"))
  }

  test("property: framing is an identity on random CR-free payloads") {
    import org.scalacheck.Gen
    val payloadGen = Gen.listOf(Gen.frequency(
      20 -> Gen.alphaNumChar, 4 -> Gen.const(' '), 1 -> Gen.const('\n'),
      1 -> Gen.oneOf("<>&\"'#?/=:@".toSeq))).map(_.mkString)
    val docs = Gen.listOfN(60, payloadGen).sample.getOrElse(Nil)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
      .withColumn("uri",
        concat(lit("https://p.ex.com/"), format_string("%04d", col("doc_id"))))
    val dir = tmpDir("wet-prop")
    Wet.toRecords(df, "text", "uri").coalesce(1)
      .write.mode("overwrite").option("lineSep", Wet.RecordSeparator)
      .text(dir)
    val got = Wet.read(spark, dir)
      .select("target_uri", "payload", "length_ok")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val want = docs.map { case (i, t) =>
      // the reader strips trailing CRLF runs only; payloads here are
      // CR-free, so the payload survives byte-identical
      (f"https://p.ex.com/$i%04d", t, true)
    }
    assert(got == want)
  }

  test("response records round-trip: status/ctype/location/body parse") {
    val rows = Seq(
      (1L, 200L, "OK", "text/html", null: String, "hello\nworld"),
      (2L, 301L, "Moved Permanently", "text/html",
        "https://ex.com/p/3", ""),
      (3L, 404L, "Not Found", "text/html; charset=UTF-8",
        null: String, "not found"),
      (4L, 200L, "OK", "application/pdf", null: String, "binaryish"))
      .toDF("doc_id", "status", "reason", "ctype", "location", "body")
      .withColumn("uri", concat(lit("https://ex.com/p/"), col("doc_id")))
    val dir = tmpDir("warc-rt")
    Wet.toResponseRecords(rows, "uri", "status", "reason", "ctype",
        "location", "body")
      .coalesce(1).write.mode("overwrite")
      .option("lineSep", Wet.RecordSeparator).text(dir)
    val got = Wet.readResponses(spark, dir).collect()
      .map(r => (r.getString(1),
        (r.getAs[Long]("status"), r.getAs[String]("content_type"),
          Option(r.getAs[String]("location")), r.getAs[String]("body"))))
      .toMap
    assert(got("https://ex.com/p/1") ===
      ((200L, "text/html", None, "hello\nworld")))
    assert(got("https://ex.com/p/2") ===
      ((301L, "text/html", Some("https://ex.com/p/3"), "")))
    // parameters after ';' strip from the media type
    assert(got("https://ex.com/p/3") ===
      ((404L, "text/html", None, "not found")))
    assert(got("https://ex.com/p/4") ===
      ((200L, "application/pdf", None, "binaryish")))
    assert(Wet.readResponses(spark, dir).collect()
      .forall(_.getString(0) == "response"))
  }

  test("Content-Location never masquerades as a redirect Location") {
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.com/\r\nContent-Length: 99\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Location: https://cdn.x.com/a\r\n" +
      "Content-Type: text/html\r\n\r\nbody"
    val r = Wet.parseResponses(Seq(rec).toDF("rec"), "rec").head()
    assert(r.isNullAt(r.fieldIndex("location")))
    assert(r.getAs[String]("content_type") === "text/html")
    // ...and a real Location still parses
    val rec2 = rec.replace("Content-Location", "Location")
    val r2 = Wet.parseResponses(Seq(rec2).toDF("rec"), "rec").head()
    assert(r2.getAs[String]("location") === "https://cdn.x.com/a")
  }

  test("a NULL status renders a diagnosable record, not a NULL row") {
    val rows = Seq((1L, null.asInstanceOf[java.lang.Long], null: String,
      "text/html", null: String, "b"))
      .toDF("doc_id", "status", "reason", "ctype", "location", "body")
      .withColumn("uri", concat(lit("https://x.com/"), col("doc_id")))
    val recs = Wet.toResponseRecords(rows, "uri", "status", "reason",
      "ctype", "location", "body").collect()
    assert(recs.length === 1 && recs(0).getString(0) != null)
    val r = Wet.parseResponses(
      Seq(recs(0).getString(0)).toDF("rec"), "rec").head()
    assert(r.isNullAt(r.fieldIndex("status")))
    assert(r.getAs[String]("body") === "b")
  }

  test("an unparseable HTTP status line goes NULL, row kept") {
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.com/\r\nContent-Length: 20\r\n\r\n" +
      "GARBAGE not a status\r\n\r\nbody"
    val got = Wet.parseResponses(Seq(rec).toDF("rec"), "rec").collect()
    assert(got.length === 1)
    assert(got(0).isNullAt(got(0).fieldIndex("status")))
    assert(got(0).getString(5) === "body")
  }

  test("a garbled Content-Length is visible: length_ok = false, row kept") {
    val dir = tmpDir("wet-bad")
    val file = new java.io.File(dir, "bad.wet")
    val rec1 = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://ex.com/a\r\nContent-Length: 999\r\n\r\nshort"
    val rec2 = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://ex.com/b\r\nContent-Length: 2\r\n\r\nok"
    java.nio.file.Files.write(file.toPath,
      (rec1 + Wet.RecordSeparator + rec2).getBytes("UTF-8"))
    val got = collectRows(Wet.read(spark, dir))
    assert(got == Seq(
      ("conversion", "https://ex.com/a", 999L, "short", false),
      ("conversion", "https://ex.com/b", 2L, "ok", true)))
  }

  test("short records degrade to NULL/empty columns, never an ANSI abort") {
    // real WARC files interleave warcinfo/request/metadata records with
    // FEWER CRLFCRLF-separated sections than a response — one of them
    // must not abort the whole job (ANSI element_at would)
    val headerOnly = "WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Length: 0" // no blank line, no payload at all
    val noBody = "WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: https://x.com/\r\nContent-Length: 30\r\n\r\n" +
      "GET / HTTP/1.1\r\nHost: x.com" // HTTP block but no CRLFCRLF+body
    // Content-Length 28 = len("HTTP/1.1 200 OK") + 4 + len("body here")
    val full = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.com/\r\nContent-Length: 28\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nbody here"
    val conv = Wet.parseRecords(
      Seq(headerOnly).toDF("rec"), "rec").collect()
    assert(conv.length === 1 && conv(0).getString(0) === "warcinfo")
    assert(conv(0).getAs[String]("payload") === "")
    val resp = Wet.parseResponses(
      Seq(headerOnly, noBody, full).toDF("rec"), "rec")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(resp("warcinfo").getAs[String]("body") === "")
    assert(resp("warcinfo").isNullAt(resp("warcinfo").fieldIndex("status")))
    assert(resp("request").getAs[String]("body") === "")
    assert(resp("response").getAs[String]("body") === "body here")
    assert(resp("response").getAs[Boolean]("length_ok"))
    assert(!resp("request").getAs[Boolean]("length_ok"))
  }

  test("a response body's own trailing CRLF survives and length_ok agrees") {
    val rows = Seq((1L, 200L, "OK", "text/html", null: String,
      "line one\r\n")) // body legitimately ends in CRLF
      .toDF("doc_id", "status", "reason", "ctype", "location", "body")
      .withColumn("uri", concat(lit("https://x.com/"), col("doc_id")))
    val rec = Wet.toResponseRecords(rows, "uri", "status", "reason",
      "ctype", "location", "body").head().getString(0)
    val r = Wet.parseResponses(Seq(rec).toDF("rec"), "rec").head()
    assert(r.getAs[String]("body") === "line one\r\n")
    assert(r.getAs[Boolean]("length_ok"))
    // ...and a record carrying ONE trailing separator remnant (the
    // file-tail shape) still sheds exactly that remnant
    val r2 = Wet.parseResponses(
      Seq(rec + Wet.RecordSeparator).toDF("rec"), "rec").head()
    assert(r2.getAs[String]("body") === "line one\r\n")
    assert(r2.getAs[Boolean]("length_ok"))
  }

  test("a garbled Content-Length header degrades to NULL, not an ANSI abort") {
    val rec = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x.com/\r\nContent-Length: abc\r\n\r\npay"
    val r = Wet.parseRecords(Seq(rec).toDF("rec"), "rec").head()
    assert(r.isNullAt(r.fieldIndex("content_length")))
    assert(!r.getAs[Boolean]("length_ok"))
  }
}
