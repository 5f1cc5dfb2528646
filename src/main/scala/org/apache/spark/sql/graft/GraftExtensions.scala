package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * into the codegen'd [[ArrayDot]] primitive loop (~10× in pairwise hot
  * paths). Users keep writing the portable HOF form; plans run the fast
  * expression — the classic "extend Catalyst, not the API" move.
  *
  * Applies only when both arrays are `array<double>` with non-nullable
  * elements: with a null element the HOF form returns null while ArrayDot
  * would skip it, so nullable-element inputs are left untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def denseDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(m1: NamedLambdaVariable, m2: NamedLambdaVariable, _),
          Seq(ma: NamedLambdaVariable, mb: NamedLambdaVariable), _),
        LambdaFunction(f: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
      if zero == 0.0 &&
        denseDoubleArray(a) && denseDoubleArray(b) &&
        Set(x.exprId, y.exprId) == Set(zx.exprId, zy.exprId) &&
        Set(m1.exprId, m2.exprId) == Set(ma.exprId, mb.exprId) &&
        f.exprId == fa.exprId =>
      ArrayDot(a, b)
  }
}

/** `spark.sql.extensions=org.apache.spark.sql.graft.GraftSparkExtensions`
  * wires the engine's Catalyst extensions into any session at build time;
  * [[GraftSparkExtensions.install]] adds them to a live session.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => RewriteDotProduct)
}

object GraftSparkExtensions {
  /** Install on an already-running session via experimental methods. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
}
