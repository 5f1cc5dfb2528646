package graft

import org.apache.spark.sql.functions._

import graft.operators.Frontier

/** [[graft.operators.Frontier.schedule]]: best-first wave assignment
  * with url tiebreak, depth-cap drop, default-delay fallthrough, eta
  * arithmetic, and the WindowGroupLimit plan shape the cap promises.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private val delays =
    Seq(("a.com", 2000L), ("b.com", 500L)).toDF("domain", "delay_ms")

  private def frontier(rows: (String, String, Long)*) =
    rows.toSeq.toDF("url", "domain", "priority")

  test("waves are best-priority-first with url ASC tiebreak") {
    val out = Frontier.schedule(
      frontier(("u3", "a.com", 5L), ("u1", "a.com", 9L),
        ("u2", "a.com", 5L)),
      "url", "domain", "priority", delays)
      .orderBy("wave").collect()
    assert(out.map(r => (r.getAs[String]("url"), r.getAs[Long]("wave")))
      .toSeq === Seq(("u1", 1L), ("u2", 2L), ("u3", 3L)))
  }

  test("depth cap drops the tail; eta multiplies the domain delay") {
    val out = Frontier.schedule(
      frontier((1 to 5).map(i => (s"u$i", "a.com", (10 - i).toLong)): _*),
      "url", "domain", "priority", delays, maxDepth = 3)
      .orderBy("wave").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("eta_ms")).toSeq === Seq(0L, 2000L, 4000L))
  }

  test("unlisted domains fall through to the default delay") {
    val out = Frontier.schedule(
      frontier(("u1", "zz.com", 1L), ("u2", "zz.com", 0L)),
      "url", "domain", "priority", delays, defaultDelayMs = 700L)
      .orderBy("wave").collect()
    assert(out.map(r => (r.getAs[Long]("delay_ms"),
      r.getAs[Long]("eta_ms"))).toSeq === Seq((700L, 0L), (700L, 700L)))
  }

  test("retrySchedule: Retry-After floors the exponential; cap; filters") {
    val resp = Seq(
      ("u1", 503L, null.asInstanceOf[java.lang.Long]),
      ("u2", 429L, java.lang.Long.valueOf(7L)),
      ("u3", 200L, null.asInstanceOf[java.lang.Long]),
      ("u4", 404L, null.asInstanceOf[java.lang.Long]),
      ("u5", 500L, null.asInstanceOf[java.lang.Long]))
      .toDF("url", "status", "retry_after_sec")
    val got = graft.operators.Frontier.retrySchedule(
      resp, "url", "status", "retry_after_sec",
      maxAttempts = 4, baseMs = 1000L, capMs = 6000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(x => (x._2, x._3)).toSeq).toMap
    // exponential 1s,2s,4s then the 6s cap bites at attempt 4
    assert(got("u1") === Seq((1000L, 1000L), (2000L, 3000L),
      (4000L, 7000L), (6000L, 13000L)))
    // Retry-After 7s floors everything, itself capped at 6s
    assert(got("u2") === Seq((6000L, 6000L), (6000L, 12000L),
      (6000L, 18000L), (6000L, 24000L)))
    assert(!got.contains("u3") && !got.contains("u4"))
    assert(got("u5").head === ((1000L, 1000L)))
  }

  test("the depth cap compiles to a WindowGroupLimit") {
    // the optimizer only inserts the limit when it can prune (known
    // maxRows above the cap skips it), so the cap must undercut the
    // input size
    val plan = Frontier.schedule(
      frontier((1 to 5).map(i => (s"u$i", "a.com", i.toLong)): _*),
      "url", "domain", "priority", delays, maxDepth = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("fetchGaps: bucketed carry = the unbounded window, empty buckets included") {
    // a skewed plant: one mega-domain with fetches spread across four
    // buckets (bucket 2 EMPTY — the carry must reach back across it),
    // intra-bucket ties broken by id, plus a sparse domain and a
    // single-fetch domain (NULL gap)
    val bucket = 100L
    val rows = (
      (0 until 40).map(i => ("mega.com", i.toLong, 10L + i * 2)) ++ // bkt 0
        Seq(("mega.com", 100L, 150L), ("mega.com", 101L, 150L),     // bkt 1 tie
          ("mega.com", 102L, 399L),                                 // bkt 3
          ("sparse.com", 200L, 5L), ("sparse.com", 201L, 350L),
          ("solo.com", 300L, 77L))
      ).toDF("domain", "event_id", "us")
    val got = Frontier.fetchGaps(rows, "domain", "us", "event_id",
        bucketUs = bucket)
      .select("domain", "event_id", "gap_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    // unbounded-window reference, computed in memory
    val want = rows.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .flatMap { case (_, rs) =>
        val sorted = rs.sortBy(t => (t._3, t._2)).toSeq
        sorted.zipWithIndex.map { case ((d, id, us), i) =>
          (d, id) -> (if (i == 0) None else Some(us - sorted(i - 1)._3))
        }
      }
      .toMap
    assert(got === want)
    // the big window partitions by (domain, bucket), never domain alone
    val plan = Frontier.fetchGaps(rows, "domain", "us", "event_id",
        bucketUs = bucket)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), plan.take(2000))
  }

  test("budgetAllocate: water level, full satisfaction, remainder, exhaustion") {
    def alloc(budget: Long, rows: (String, Long)*) =
      graft.operators.Frontier.budgetAllocate(
        rows.toSeq.toDF("domain", "n"), "domain", "n", budget)
        .collect()
        .map(r => r.getString(0) -> (r.getBoolean(2), r.getLong(3)))
        .toMap
    // classic: small sites full, big ones split the rest evenly
    val g1 = alloc(100L, ("a", 10L), ("b", 20L), ("c", 100L), ("d", 200L))
    assert(g1 === Map("a" -> ((true, 10L)), "b" -> ((true, 20L)),
      "c" -> ((false, 35L)), "d" -> ((false, 35L))))
    // budget >= total: everyone fully satisfied
    val g2 = alloc(1000L, ("a", 10L), ("b", 20L))
    assert(g2 === Map("a" -> ((true, 10L)), "b" -> ((true, 20L))))
    // integer remainder lands on the lexicographically-first capped
    val g3 = alloc(101L, ("a", 10L), ("b", 20L), ("c", 100L), ("d", 200L))
    assert(g3("c") === ((false, 36L)) && g3("d") === ((false, 35L)))
    // budget below every fair share: nobody satisfied, exact split
    val g4 = alloc(7L, ("a", 10L), ("b", 20L), ("c", 100L))
    assert(g4 === Map("a" -> ((false, 3L)), "b" -> ((false, 2L)),
      "c" -> ((false, 2L))))
    // budget is exhausted exactly in every case
    for (g <- Seq(g1, g3, g4))
      assert(g.values.map(_._2).sum ===
        Seq(100L, 101L, 7L)(Seq(g1, g3, g4).indexOf(g)))
  }

  test("fetchGaps refuses an input that carries its contract columns") {
    val e = intercept[IllegalArgumentException] {
      Frontier.fetchGaps(
        Seq(("a.com", 1L, 2L, 0L)).toDF("domain", "event_id", "us", "gap_us"),
        "domain", "us", "event_id")
    }
    assert(e.getMessage.contains("gap_us"))
  }
}
