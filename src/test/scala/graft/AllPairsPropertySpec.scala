package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Dedup

/** Property: prefix-filter all-pairs ([[Dedup.allPairsJaccard]]) agrees
  * with a direct all-pairs reference on ANY corpus and ANY threshold —
  * the Bayardo completeness proof machine-checked on random data. A tiny
  * vocabulary forces heavy token sharing (the regime where prefix
  * pruning actually discards candidates and a pruning bug would bite);
  * thresholds sweep low (prefixes near-total) to high (prefixes of one
  * or two tokens). Duplicate tokens, empty docs, and identical docs all
  * occur by construction.
  */
class AllPairsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refPairs(
      docs: Seq[(Long, String)],
      t100: Int): Set[(Long, Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    (for {
      a <- sets.keys; b <- sets.keys
      if a < b && sets(a).nonEmpty && sets(b).nonEmpty
      inter = (sets(a) & sets(b)).size.toLong
      union = (sets(a) | sets(b)).size.toLong
      if inter * 100 >= t100 * union
    } yield (a, b, inter, sets(a).size.toLong, sets(b).size.toLong,
      inter * 10000 / union)).toSet
  }

  private val wordGen = Gen.oneOf("p", "q", "r", "s", "t", "u")
  private val docGen = for {
    len <- Gen.choose(0, 8)
    ws <- Gen.listOfN(len, wordGen)
  } yield ws.mkString(" ")

  test("allPairsJaccard ≡ brute-force reference (randomized corpora × thresholds)") {
    val seed = org.scalacheck.rng.Seed(1717L)
    val corpora = Gen.listOfN(6, Gen.listOfN(7, docGen))
      .apply(Gen.Parameters.default, seed).getOrElse(Nil)
    assert(corpora.nonEmpty)
    for {
      texts <- corpora
      t100 <- Seq(34, 60, 85, 100)
    } {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.allPairsJaccard(docs.toDF("doc_id", "text"),
          "text", "doc_id", t100)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("n_common"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("jaccard_pp10k")))
        .toSet
      assert(got == refPairs(docs, t100), s"t100=$t100 texts=$texts")
    }
  }
}
