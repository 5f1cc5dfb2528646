package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftSparkExtensions, RewriteDotProduct}

import graft.functions.VectorFunctions._

class GraftExtensionsSpec extends SparkSpec {

  test("RewriteDotProduct: HOF fold rewrites to the codegen'd ArrayDot, results unchanged") {
    val s2 = spark.newSession()
    GraftSparkExtensions.install(s2)
    // non-literal source so constant folding can't collapse the plan first
    val df = s2.range(2, 3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(dotFold(col("a"), col("b")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_array_dot"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.head().getDouble(0) == 2.0 * 3.0 + 2.0 * 4.0)
  }

  test("rule leaves nullable-element arrays untouched (null semantics differ)") {
    val s2 = spark.newSession()
    GraftSparkExtensions.install(s2)
    import s2.implicits._
    val df = Seq((Seq(Option(1.0), None), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b")
      .select(dotFold(col("a"), col("b")).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_array_dot"))
    assert(df.head().isNullAt(0)) // HOF null-propagation preserved
  }

  test("install is idempotent; base session without the rule keeps the HOF plan") {
    val s2 = spark.newSession()
    GraftSparkExtensions.install(s2)
    GraftSparkExtensions.install(s2)
    assert(s2.experimental.extraOptimizations.count(_ == RewriteDotProduct) == 1)
    import spark.implicits._
    val plain = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b")
      .select(dotFold(col("a"), col("b")).as("d"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("graft_array_dot"))
  }
}
