package graft

import graft.operators.Entropy

/** [[graft.operators.Entropy.charEntropy]]: exact micro-nat values on
  * closed-form distributions (uniform over k symbols = ln k), the
  * zero-entropy flood, the charless NULL-average/false-keep contract,
  * and threshold boundary behavior.
  */
class EntropySpec extends SparkSpec {
  import spark.implicits._

  private val Ln2Micro = 693147L  // round(ln(2) × 1e6)
  private val Ln4Micro = 1386294L // round(ln(4) × 1e6)

  private def ent(texts: (Long, String)*)(thr: Long = 500000L) =
    Entropy.charEntropy(
      texts.toSeq.toDF("doc_id", "text"), "text", "doc_id", thr)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))))
      .toMap

  test("uniform distributions hit the closed form ln k") {
    val m = ent(1L -> "aabb", 2L -> "abcd", 3L -> "aaaa")()
    assert(m(1L) === ((4L, 2L, 4 * Ln2Micro / 2 * 2, Some(Ln2Micro), true)))
    assert(m(2L) === ((4L, 4L, 4 * Ln4Micro, Some(Ln4Micro), true)))
    // single-symbol flood: zero surprise, fails any positive floor
    assert(m(3L) === ((4L, 1L, 0L, Some(0L), false)))
  }

  test("empty and NULL text: zero counts, NULL average, keep false") {
    val m = ent(1L -> "", 2L -> null.asInstanceOf[String])()
    assert(m(1L) === ((0L, 0L, 0L, None, false)))
    assert(m(2L) === ((0L, 0L, 0L, None, false)))
  }

  test("keep is a floor on the floored average") {
    // "aabb" averages exactly ln2 micro-nats: threshold at the value
    // keeps, one above drops.
    val atThr = ent(1L -> "aabb")(Ln2Micro)
    val above = ent(1L -> "aabb")(Ln2Micro + 1)
    assert(atThr(1L)._5 === true)
    assert(above(1L)._5 === false)
  }

  test("whitespace and newlines count as characters") {
    val m = ent(1L -> "a b\na b\n")()
    // chars: a×2, b×2, space×2, \n×2 — uniform over 4 → ln 4
    assert(m(1L)._1 === 8L)
    assert(m(1L)._2 === 4L)
    assert(m(1L)._4 === Some(Ln4Micro))
  }
}
