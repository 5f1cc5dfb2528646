package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("hash sampling is deterministic, salt-independent, and rate-accurate") {
    val ev = Tables.events(spark, sf0001).select("event_id")
    val n = ev.count().toDouble

    val a = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L)))
    val b = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L)))
    assert(a == b, "same key+salt+rate must select the identical row set")

    // a different salt draws an (almost surely) different sample at the
    // same rate — the independence property train/holdout cuts rely on
    val c = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L), salt = "holdout"))
    assert(c != a)
    assert(math.abs(c.size - n * 0.25) / n < 0.05)
    assert(math.abs(a.size - n * 0.25) / n < 0.05)

    // nested rates: a lower threshold selects a SUBSET of a higher one
    // (bucket predicate is monotone) — lets one cut consistent 1%/10%/100%
    // corpus tiers where the small tier is contained in the large
    val tiny = ids(Sampling.hashSample(ev, col("event_id"), lit(50000L)))
    assert(tiny.subsetOf(a))
    assert(ids(Sampling.hashSample(ev, col("event_id"), lit(1000000L))).size == n.toLong)
  }
}
