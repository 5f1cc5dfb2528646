package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Bpe

/** Property: the wrapped-string `replace` machinery of
  * [[Bpe.trainMerges]] agrees with a direct list-of-symbols reference
  * implementation on ANY vocabulary — including repeated-letter words
  * (where greedy non-overlap matters), multi-char symbols that could
  * tempt a mid-symbol match, tie-heavy frequency tables, and vocabularies
  * that exhaust before the round budget.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Greedy left-to-right non-overlapping merge of one pair. */
  private def mergeOnce(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeOnce(rest, l, r)
      case a :: rest => a :: mergeOnce(rest, l, r)
      case Nil => Nil
    }

  /** Reference trainer over driver-side lists. */
  private def refTrain(
      vocab: Seq[(String, Long)],
      rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var seqs = vocab.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seqs; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((round.toLong, l, r, l + r, n))
        seqs = seqs.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
        round += 1
      }
    }
    out.result()
  }

  private val wordGen = for {
    len <- Gen.choose(1, 7)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val vocabGen = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, wordGen)
    fs <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield ws.distinct.zip(fs)

  test("trainMerges ≡ reference list implementation (randomized vocabularies)") {
    val seed = org.scalacheck.rng.Seed(1337L)
    val vocabs = Gen.listOfN(12, vocabGen)
      .apply(Gen.Parameters.default, seed).getOrElse(Nil)
    assert(vocabs.nonEmpty)
    vocabs.filter(_.nonEmpty).foreach { vocab =>
      val expected = refTrain(vocab, rounds = 4)
      val got = Bpe.trainMerges(vocab.toDF("w", "freq"), "w", "freq", rounds = 4)
        .orderBy(col("round")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .toSeq
      assert(got == expected, s"vocab=$vocab")
    }
  }
}
