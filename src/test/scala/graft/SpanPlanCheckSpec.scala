package graft

/** The round-16 skew sweep's plan promise on the ExactSubstr one-shot
  * gates: the occurrence core's gram count is a two-phase aggregate,
  * so no Window survives anywhere in these plans (the island fold is
  * a doc-keyed aggregation, not a window chain).
  */
class SpanPlanCheckSpec extends SparkSpec {
  for (name <- Seq("q84_dup_spans", "q88_strip_spans")) {
    test(s"$name plan: no Window anywhere (two-phase gram counts)") {
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window in $name:\n${plan.take(3000)}")
    }
  }
}
