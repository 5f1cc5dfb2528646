package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>` embedding
  * columns, composed from Spark's higher-order functions (codegen'd; no UDF,
  * no per-row JVM object churn beyond the unavoidable ArrayData access).
  *
  * All math is done in Double after an explicit element cast so results are
  * bit-comparable with any engine that also accumulates in float64.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> for drift-free accumulation. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — codegen'd custom Catalyst expression (see [[ArrayDot]]);
    * identical left-to-right accumulation order as the HOF fold, so results
    * are bit-for-bit unchanged.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.graft.ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Reference HOF fold implementation (kept for cross-checking ArrayDot). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm (codegen'd via ArrayDot; same accumulation order as a fold). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
