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
}
