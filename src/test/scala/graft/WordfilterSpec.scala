package graft

import graft.operators.Wordfilter

/** [[graft.operators.Wordfilter.score]]: whole-token equality (no
  * substring hits), multiplicity, density arithmetic, verdicts, the
  * tokenless contract, and the list-shape guard.
  */
class WordfilterSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("jackpot", "casino")

  private def score(rows: (Long, String)*) =
    Wordfilter.score(rows.toSeq.toDF("doc_id", "text"), "text",
      "doc_id", words)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4))))
      .toMap

  test("whole tokens only; multiplicity counts; case folds") {
    val m = score(
      1L -> "JACKPOT casino jackpot fun", // 3 hits of 4 tokens
      2L -> "jackpots casinos classy",    // substrings never hit
      3L -> "perfectly clean text here")
    assert(m(1L) === ((4L, 3L, Some(7500L), false)))
    assert(m(2L) === ((3L, 0L, Some(0L), true)))
    assert(m(3L) === ((4L, 0L, Some(0L), true)))
  }

  test("empty and NULL text: zero tokens, NULL density, keep") {
    val m = score(1L -> "", 2L -> null.asInstanceOf[String])
    assert(m(1L) === ((0L, 0L, None, true)))
    assert(m(2L) === ((0L, 0L, None, true)))
  }

  test("list-shape guard: uppercase / multiword / empty entries refuse") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Wordfilter.score(df, "text", "doc_id", Seq("Jackpot"))
    }
    intercept[IllegalArgumentException] {
      Wordfilter.score(df, "text", "doc_id", Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      Wordfilter.score(df, "text", "doc_id", Seq.empty)
    }
  }
}
