package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused max-cosine + threshold-hit-count of one corpus vector against a
  * BOUNDED reference set riding in the expression itself — the semantic-
  * decontamination kernel (`Dedup.semanticDecontaminate`): per corpus
  * vector, `(max_j round(cos(v, e_j), 6), #{j : round(cos(v, e_j), 6) ≥ τ})`
  * over every eval-suite vector e_j.
  *
  * Why an expression and not the HOF fold it replaces: `aggregate(ev, …)`
  * evaluates an interpreted lambda per eval VECTOR per corpus row, building
  * a struct accumulator each step and recomputing ‖v‖ for every pair — at
  * sf1 (47 k corpus × 2.6 k eval) that measured 245 s for what is ~8 GFLOP
  * of dot products, and the cost is O(corpus × eval) so it compounds
  * quadratically with scale. This expression hoists the corpus vector into
  * a primitive array once per row, computes ‖v‖ once, and runs a tight
  * compiled loop over the (driver-prepared, task-closure-shipped) eval
  * matrix. The eval set is bounded by contract — benchmarks, not corpora
  * (MBs) — which is the same justification as the broadcast it replaces.
  *
  * Bit-compatibility contract (the gate's oracle must not move): dot is the
  * [[ArrayDot]] left-to-right accumulation truncated at the shorter length;
  * norms are `sqrt(dot(x, x))` over each full vector, with `evNorms`
  * REQUIRED to be computed by [[CosineMaxHits.norm]] on the SAME doubles so
  * driver and executor agree bit-for-bit; cosine is `d / (‖v‖·‖e‖)` with
  * the zero-norm → 0.0 guard; rounding is Spark `round(_, 6)` (HALF_UP via
  * BigDecimal.valueOf — [[CosineMaxHits.round6]]); a non-finite corpus
  * vector (or a NaN cosine) contributes the −2.0 sentinel, exactly the HOF
  * form's `when` guard. A null input array yields (−2.0, 0) — what the
  * fold's null-propagating `when(…).otherwise(−2.0)` produced — NOT a null
  * struct.
  *
  * Output: struct(mx DOUBLE, hits LONG); `mx = −2.0` means "no finite
  * cosine" and is NULLed by the caller.
  */
case class CosineMaxHits(
    child: Expression,
    ev: Array[Array[Double]],
    evNorms: Array[Double],
    tau: Double)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  require(ev.length == evNorms.length,
    "CosineMaxHits: one precomputed norm per eval vector")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("mx", DoubleType, nullable = false),
    StructField("hits", LongType, nullable = false)))
  override def prettyName: String = "graft_cosine_max_hits"

  private val None2 = -2.0

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return InternalRow(None2, 0L)
    val arr = raw.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var finite = true
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { finite = false; v(i) = Double.NaN }
      else {
        val x = arr.getDouble(i)
        v(i) = x
        // |x| <= MaxValue is false for ±Inf and NaN — isFiniteVec's test
        if (!(math.abs(x) <= Double.MaxValue)) finite = false
      }
      i += 1
    }
    if (!finite) return InternalRow(None2, 0L)
    val nv = CosineMaxHits.norm(v)
    var mx = None2
    var hits = 0L
    var j = 0
    while (j < ev.length) {
      val e = ev(j)
      val m = math.min(n, e.length)
      var d = 0.0
      var k = 0
      while (k < m) { d += v(k) * e(k); k += 1 }
      val nn = nv * evNorms(j)
      val c = if (nn == 0.0) 0.0 else d / nn
      val c6 = CosineMaxHits.round6(c)
      if (!c6.isNaN) {
        if (c6 > mx) mx = c6
        if (c6 >= tau) hits += 1L
      }
      j += 1
    }
    InternalRow(mx, hits)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineMaxHits =
    copy(child = newChild)
}

object CosineMaxHits {

  /** ‖x‖ with the exact [[ArrayDot]] accumulation order — callers MUST
    * use this for `evNorms` so driver-side and executor-side norms are
    * the same doubles.
    */
  def norm(x: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * x(i); i += 1 }
    math.sqrt(acc)
  }

  /** Spark's `round(double, 6)`: HALF_UP on the shortest-decimal
    * representation (BigDecimal.valueOf), the same rounding every cosine
    * gate in the engine applies.
    */
  def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()
}
