package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Tuple1(text)).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("normalized collapses whitespace and lowercases") {
    assert(one[String](normalized(col("t")), "  Hello   WORLD\t\n x ") == "hello world x")
  }

  test("token counts") {
    assert(one[Int](tokenCount(col("t")), "a b c b") == 4)
    assert(one[Int](uniqueTokenCount(col("t")), "a b c b") == 3)
  }

  test("word ngrams: n=2 over 4 tokens → 3 bigrams; short docs → empty") {
    assert(one[collection.Seq[String]](wordNgrams(col("t"), 2), "a b c d").toSeq ==
      Seq("a b", "b c", "c d"))
    assert(one[collection.Seq[String]](wordNgrams(col("t"), 3), "a b").toSeq == Seq())
  }

  test("char shingles") {
    assert(one[collection.Seq[String]](charShingles(col("t"), 3), "abcd").toSeq ==
      Seq("abc", "bcd"))
  }

  test("stableHash60 equals DuckDB's hex-cast of md5 prefix (value pinned)") {
    // DuckDB: CAST(concat('0x', substr(md5('abc'),1,15)) AS BIGINT) = 648541476951500027
    assert(one[Long](stableHash60(col("t")), "abc") == 648541476951500027L)
  }

  test("codegen'd StableHash60 is bit-identical to the declarative md5 form") {
    // adversarial inputs: empty, single char, unicode multi-byte, long,
    // whitespace, plus a pseudo-random ASCII/unicode mix
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", "é", "日本語テキスト", " \t\n ", "x" * 10000,
      "café ☕ναι 🚀") ++
      Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq.fill(50)(Seq.fill(rnd.nextInt(20))(rnd.nextPrintableChar()).mkString)
    import spark.implicits._
    val df = cases.toDF("t")
      .select(stableHash60(col("t")).as("fast"),
        graft.functions.TextFunctions.stableHash60Reference(col("t")).as("ref"))
    val bad = df.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad/${cases.size} inputs diverge from the reference hash")
    // and every value fits the declared 60-bit non-negative range
    assert(df.filter(col("fast") < 0 || col("fast") >= (1L << 60)).count() == 0)
  }

  test("fingerprint is md5 of normalized text") {
    assert(one[String](fingerprint(col("t")), " Abc  ") ==
      one[String](fingerprint(col("t")), "abc"))
  }

  test("chunkStarts: stride offsets, short tail, empty/null text, guards") {
    def starts(s: String) =
      one[scala.collection.Seq[Int]](chunkStarts(col("t"), 10, 3), s).toSeq
    assert(starts("x" * 25) == Seq(1, 8, 15, 22)) // stride 7 over len 25
    assert(starts("short") == Seq(1))
    assert(starts("") == Seq(1))   // one (empty) chunk per doc, always
    val nullStarts = spark.sql("SELECT 1").select(
      chunkStarts(org.apache.spark.sql.functions.lit(null).cast("string"), 10, 3))
      .collect().head.getSeq[Int](0)
    assert(nullStarts == Seq(1)) // null text behaves like empty
    intercept[IllegalArgumentException] { chunkStarts(col("t"), 10, 10) }
    // chunk reconstruction covers the text with the declared overlap
    val text = "abcdefghijklmnopqrstuvwxyz"
    val chunks = starts(text).map(s0 => text.slice(s0 - 1, s0 - 1 + 10))
    assert(chunks.head == "abcdefghij" && chunks.last.nonEmpty)
    assert(chunks.sliding(2).forall {
      case Seq(a, b) => a.takeRight(3) == b.take(3); case _ => true })
  }

  test("tokenRatio counts duplicate hits") {
    assert(one[Double](tokenRatio(col("t"), Seq("the")), "the cat the dog") == 0.5)
  }

  test("langId picks dominant stopword profile; unknown below threshold") {
    assert(one[String](langId(col("t")), "the cat and the dog is in a house") == "en")
    assert(one[String](langId(col("t")), "der hund und die katze ist ein tier") == "de")
    assert(one[String](langId(col("t")), "zzz qqq www eee") == "unknown")
  }

  test("winnowing fingerprints: guarantee, edges, and determinism") {
    def fps(text: String): Seq[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(shingleHashes(col("t")).as("hs"))
        .select(winnowSelect(col("hs")).as("v"))
        .head().getAs[collection.Seq[Long]]("v").toSeq

    // winnowing guarantee: documents sharing a substring of >= w+k-1 = 10
    // chars share at least one fingerprint
    val shared = "the quick brown fox jumps over the lazy dog"
    val a = fps(s"PREFIX AAA $shared")
    val b = fps(s"$shared SUFFIX ZZZZ")
    assert(a.intersect(b).nonEmpty, s"no shared fingerprint:\n$a\n$b")
    // unrelated texts (disjoint shingle sets) share nothing
    assert(fps("aaaaaaaaaaaaaaa").intersect(fps("bbbbbbbbbbbbbbb")).isEmpty)
    // output is sorted distinct
    assert(a == a.distinct.sorted)
    // edges: shorter than k -> empty; exactly one shingle -> one fingerprint
    assert(fps("abc").isEmpty)
    assert(fps("abcdefg").length == 1)
    // identical normalized content -> identical signature
    assert(fps("  The QUICK  brown fox jumps") == fps("the quick brown fox jumps"))
  }

  test("maxElementCount = max frequency of any element (sorted-run fold)") {
    assert(one[Int](maxElementCount(tokens(col("t"))), "a b a c a b") == 3)
    assert(one[Int](maxElementCount(tokens(col("t"))), "x") == 1)
    assert(one[Int](maxElementCount(wordNgrams(col("t"), 3)), "a b") == 0)
  }

  test("maxElementCount agrees with a driver-side frequency count (property)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "d", "e")
    val cases = Seq.fill(300)(
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = cases.toDF("t")
      .select(col("t"), maxElementCount(tokens(col("t"))).as("mc"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    got.foreach { case (text, mc) =>
      // the tokenizer yields [""] for empty text — mirror that, not Seq()
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val expect = toks.groupBy(identity).values.map(_.size).max
      assert(mc == expect, s"'$text': got $mc want $expect")
    }
  }
}
