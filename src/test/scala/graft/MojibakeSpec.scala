package graft

import graft.operators.Mojibake

/** [[graft.operators.Mojibake.score]]: artifact digraph counting,
  * replacement-character counting, density arithmetic, and the
  * clean/charless contracts.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def score(rows: (Long, String)*) =
    Mojibake.score(rows.toSeq.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))))
      .toMap

  test("cp1252 digraphs and U+FFFD count; clean text stays clean") {
    val m = score(
      1L -> "naÃ¯ve caffÃ© donâ€™t",
      2L -> "perfectly fine ascii text",
      3L -> "bad�bytes�")
    assert(m(1L)._2 === 3L) // Ã¯, Ã©, â€™
    assert(m(1L)._3 === 0L)
    assert(!m(1L)._5)
    assert(m(2L) === ((25L, 0L, 0L, Some(0L), true)))
    assert(m(3L)._3 === 2L)
    assert(!m(3L)._5)
  }

  test("density is integer hits-per-10k-chars, floor") {
    // 10 chars, 1 hit → 1000 pp10k
    val m = score(1L -> ("1234567Ã©x"))
    assert(m(1L)._1 === 10L)
    assert(m(1L)._4 === Some(1000L))
  }

  test("\u00c2+nbsp and \u00c2+space digraphs count; clean spacing does not") {
    val m = score(
      1L -> "a\u00C2\u00A0b", // \u00c2 followed by a real nbsp
      2L -> "a  b",           // plain double space: clean
      3L -> "a\u00C2 b")      // \u00c2 followed by a plain space
    assert(m(1L)._2 === 1L)
    assert(m(2L)._2 === 0L)
    assert(m(3L)._2 === 1L)
  }

  test("empty and NULL text: zero counts, NULL density, clean") {
    val m = score(1L -> "", 2L -> null.asInstanceOf[String])
    assert(m(1L) === ((0L, 0L, 0L, None, true)))
    assert(m(2L) === ((0L, 0L, 0L, None, true)))
  }
}
