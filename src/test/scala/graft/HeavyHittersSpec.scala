package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Exact frequencies of a token column, computed the plain way. */
  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("Misra–Gries guarantee: freq > n/k items survive any partitioning") {
    // Zipf-ish stream: token i appears ~ 4000 / i times, k = 8 — far
    // fewer counters than the 40 distinct tokens, so decrements and the
    // merge subtraction both actually fire.
    val rnd = new Random(42)
    val items = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"t$i")).toVector)
    val n = items.size
    val k = 8
    val exact = exactCounts(items)
    val mustSurvive = exact.collect { case (t, c) if c * k > n => t }.toSet
    assert(mustSurvive.nonEmpty, "test needs true heavy items")
    for (parts <- Seq(1, 4, 13)) {
      val got = items.toDF("tok").repartition(parts)
        .agg(HeavyHitters.misraGries(col("tok"), k).as("cand"))
        .first().getSeq[Row](0).map(_.getString(0)).toSet
      assert(got.size <= k, s"parts=$parts: sketch exceeded its budget")
      assert(mustSurvive.subsetOf(got),
        s"parts=$parts: lost ${mustSurvive -- got}")
    }
  }

  test("sketch counts are lower bounds and never exceed exact counts") {
    val rnd = new Random(7)
    val items = rnd.shuffle(
      (1 to 30).flatMap(i => Seq.fill(1 + 900 / i)(s"w$i")).toVector)
    val exact = exactCounts(items)
    val got = items.toDF("tok").repartition(5)
      .agg(HeavyHitters.misraGries(col("tok"), 6).as("cand"))
      .first().getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (t, c) =>
      assert(c >= 1 && c <= exact(t), s"$t sketch=$c exact=${exact(t)}")
    }
  }

  test("null tokens are ignored, empty input yields an empty sketch") {
    val got = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
      .agg(HeavyHitters.misraGries(col("tok"), 4).as("cand"))
      .first().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1))
    assert(got == Seq("a" -> 2L, "b" -> 1L))
    val empty = Seq.empty[String].toDF("tok")
      .agg(HeavyHitters.misraGries(col("tok"), 4).as("cand"))
      .first().getSeq[Row](0)
    assert(empty.isEmpty)
  }

  test("tokenHeavyHitters == plain count + threshold, tight sketch budget") {
    // docs with a skewed vocabulary; phi = 10, k = 11 (the minimum legal
    // budget) so the candidate set is genuinely pressured
    val rnd = new Random(3)
    val docs = (0 until 60).map { id =>
      val body = (0 until 50).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 40) "alpha" else if (r < 65) "beta" else s"rare${rnd.nextInt(200)}"
      }
      (id.toLong, body.mkString(" "))
    }.toDF("doc_id", "text")
    val got = HeavyHitters.tokenHeavyHitters(docs, "text", phi = 10, k = 11)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .as[String].collect()
    val n = toks.length.toLong
    val want = exactCounts(toks.toSeq).toSeq
      .filter { case (_, c) => c * 10 > n }
      .map { case (t, c) => (t, c, n, c * 100000L / n) }
      .sortBy { case (t, c, _, _) => (-c, t) }
    assert(got.toSeq == want)
  }

  test("the verify pass kills sketch survivors below the exact threshold") {
    // 25 equal-frequency tokens, phi = 20: every token fits in the k = 32
    // sketch (all are candidates) but none clears n/20 (each holds only
    // n/25) — the published set must be empty even though candidates
    // is not.
    val docs = Seq((1L, (1 to 25).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = HeavyHitters.tokenHeavyHitters(docs, "text", phi = 20, k = 32)
    assert(out.count() == 0)
  }

  test("rejects a sketch budget that voids the superset guarantee") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.tokenHeavyHitters(docs, "text", phi = 30, k = 30)
    }
  }
}
