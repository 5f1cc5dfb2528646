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

  /** Element-wise EXACT-decimal vector sum aggregate
    * (`array<double>` → `array<decimal(38,12)>`): each element is
    * bit-identical to `sum(cast(v[d] AS decimal(38,12)))` but the whole
    * vector folds in ONE buffer probe per row instead of a `posexplode`
    * into dim generator rows + dim hash probes — the centroid-update
    * workhorse (see [[org.apache.spark.sql.graft.VectorDecimalSumAgg]]
    * for the 128-bit fixed-point design and its guards).
    */
  def vectorDecimalSum(v: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, VectorDecimalSumAgg}
    ColumnBridge.column(
      VectorDecimalSumAgg(ColumnBridge.expression(v)).toAggregateExpression())
  }

  /** L2 norm (codegen'd via ArrayDot; same accumulation order as a fold). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays (0 when either norm is 0).
    * A NaN or infinite COMPONENT still propagates (dot/norm are NaN) —
    * and Spark orders NaN above every double, so `cosine >= t` is TRUE
    * for NaN; consumers that threshold or argmax over cosines must
    * exclude non-finite vectors first ([[isFiniteVec]]).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** True iff every component is finite. `abs(x) <= MaxValue` is false
    * for ±Infinity by arithmetic and for NaN by Spark's comparison
    * semantics on the NaN side of its total order — one predicate
    * covers both poisons, and it stays codegen-friendly (no UDF).
    */
  def isFiniteVec(v: Column): Column =
    forall(v, x => abs(x) <= lit(Double.MaxValue))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Unit-normalized copy of the vector (all-zero vectors pass through). */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** Per-vector symmetric int8 scalar quantization — the standard 4×
    * shrink for ANN candidate scans (fp32 → int8 + one fp scale per
    * vector). Returns struct(q: array<tinyint>, scale: double) with
    * x ≈ q * scale, scale = maxAbs / 127; all-zero vectors get scale 0 and
    * zero codes.
    */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = maxAbs / lit(127.0)
    struct(
      when(scale === 0.0, transform(v, _ => lit(0).cast("tinyint")))
        .otherwise(transform(v, x => round(x / scale).cast("tinyint")))
        .as("q"),
      scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]] (lossy: |x − q·scale| ≤ scale/2). */
  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"), c => c.cast("double") * qs.getField("scale"))
}
