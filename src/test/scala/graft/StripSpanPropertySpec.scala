package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Dedup

/** Property: the islands-fold span strip ([[Dedup.stripDupSpans]]) agrees
  * with a direct set-based reference on ANY corpus — adjacent and
  * overlapping duplicated spans (island merging), docs shorter than k,
  * fully duplicated docs, and cross-doc vs within-doc repeats.
  */
class StripSpanPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refStrip(
      docs: Seq[(Long, String)],
      k: Int): Seq[(Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    // gram -> occurrence count across the whole corpus
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ts) <- toks; i <- 0 to ts.length - k)
      counts(ts.slice(i, i + k).mkString(" ")) =
        counts.getOrElse(ts.slice(i, i + k).mkString(" "), 0) + 1
    docs.map { case (id, _) =>
      val ts = toks(id)
      val covered = (for {
        i <- 0 to ts.length - k
        if counts(ts.slice(i, i + k).mkString(" ")) >= 2
        j <- i until i + k
      } yield j).toSet
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered(i) => t
      }
      (id, ts.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
  }

  private val wordGen = Gen.oneOf("x", "y", "z", "w")
  private val docGen = for {
    len <- Gen.choose(0, 12)
    ws <- Gen.listOfN(len, wordGen)
  } yield ws.mkString(" ")

  test("stripDupSpans ≡ set-based reference (randomized corpora, k=3)") {
    val seed = org.scalacheck.rng.Seed(4242L)
    val corpora = Gen.listOfN(8, Gen.listOfN(6, docGen))
      .apply(Gen.Parameters.default, seed).getOrElse(Nil)
    assert(corpora.nonEmpty)
    corpora.foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = refStrip(docs, k = 3).sortBy(_._1)
      val got = Dedup.stripDupSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", k = 3)
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      assert(got == expected, s"texts=$texts")
    }
  }
}
