package graft

import java.sql.Timestamp

import org.scalacheck.Gen

import graft.operators.RangeJoin

/** Property: for ANY keyed point/interval data, the binned equi-join
  * produces exactly the pairs of the naive inequality join — including
  * intervals spanning many bins, zero-length intervals, and points on bin
  * and interval boundaries.
  */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000L // fixed epoch anchor, seconds
  private val pointGen = for {
    k <- Gen.choose(1, 3)
    off <- Gen.choose(0L, 7200L)
  } yield (k.toLong, new Timestamp((base + off) * 1000))
  private val intervalGen = for {
    k <- Gen.choose(1, 3)
    start <- Gen.choose(0L, 7200L)
    // negative lengths: inverted intervals must behave as empty, not explode
    len <- Gen.choose(-1800L, 5400L) // up to 3 bins at 1800 s
  } yield (k.toLong, new Timestamp((base + start) * 1000),
    new Timestamp((base + start + len) * 1000))

  test("binned point-in-interval ≡ naive inequality join (randomized rounds)") {
    val seed = org.scalacheck.rng.Seed(42L)
    val datasets = Gen.listOfN(6,
      Gen.zip(Gen.listOfN(25, pointGen), Gen.listOfN(12, intervalGen)))
      .apply(Gen.Parameters.default, seed).getOrElse(Nil)
    assert(datasets.nonEmpty)
    datasets.foreach { case (ps, is) =>
      val points = ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "pt")
      val intervals = is.zipWithIndex.map { case ((k, s, e), i) => (i.toLong, k, s, e) }
        .toDF("iid", "k", "st", "en")
      val got = RangeJoin.pointInInterval(points, intervals, "k", "pt", "st", "en")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = points.join(intervals,
          points("k") === intervals("k") && $"pt" >= $"st" && $"pt" < $"en")
        .select(points("pid"), intervals("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }
}
