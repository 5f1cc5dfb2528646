package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise exact-decimal vector sum as a native typed-imperative
  * aggregate: `graft_vector_dsum(array<double>)` returns
  * `array<decimal(38,12)>` whose d-th element is bit-identical to
  * `sum(cast(v[d] AS decimal(38,12)))` — the engine's
  * summation-order-independent "exactAvg" discipline (see
  * [[graft.operators.Similarity.lloydStep]]) — without the
  * posexplode row blow-up that discipline otherwise costs.
  *
  * Why this shape at 100 TB: the declarative form of a centroid update is
  * `posexplode(v)` → `groupBy(key, dim)` → `sum(decimal)`. Map-side
  * partial aggregation keeps the EXCHANGE small (≤ keys × dim rows), but
  * inside every partition each corpus row still materializes `dim`
  * generator rows and pays `dim` hash-probes of a (key, dim)-keyed
  * aggregate map. This aggregate folds the whole vector per row into one
  * buffer probe; partials are (2 × dim) longs per key, merged by 128-bit
  * addition. Downstream a `posexplode` of the RESULT touches only
  * keys × dim rows.
  *
  * Exactness: each element is first rounded exactly as Spark's
  * `cast(double AS decimal(38,12))` rounds it —
  * `java.math.BigDecimal.valueOf(x)` (shortest decimal representation,
  * the `Decimal.fromDouble` path) then `setScale(12, HALF_UP)` — and the
  * resulting scaled-integer is accumulated in a 128-bit (hi, lo) pair, so
  * the sum is EXACT and independent of row order, partitioning, and merge
  * tree. Guards: a per-element magnitude bound (|x| < 9.2e6, far above
  * any normalized-embedding component — larger values would overflow the
  * scaled long) and a fixed-dimension requirement across the group throw
  * loudly instead of silently skewing a centroid. Null arrays are skipped
  * (SQL `sum` semantics); null ELEMENTS are rejected — callers filter
  * non-finite vectors first ([[graft.functions.VectorFunctions.isFiniteVec]]).
  */
case class VectorDecimalSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorDecimalSumAgg.Buffer]
    with ExpectsInputTypes {

  import VectorDecimalSumAgg._

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = false)
  override def prettyName: String = "graft_vector_dsum"

  override def createAggregationBuffer(): Buffer = new Buffer(-1, null)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.dim < 0) { buf.dim = n; buf.acc = new Array[Long](2 * n) }
    require(buf.dim == n,
      s"graft_vector_dsum: vector dimension changed within a group " +
        s"(${buf.dim} vs $n)")
    var d = 0
    while (d < n) {
      require(!arr.isNullAt(d),
        "graft_vector_dsum: null vector element (filter non-finite " +
          "vectors upstream)")
      add128(buf.acc, d, scaled12(arr.getDouble(d)))
      d += 1
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.dim < 0) return buf
    if (buf.dim < 0) { buf.dim = other.dim; buf.acc = other.acc.clone(); return buf }
    require(buf.dim == other.dim,
      s"graft_vector_dsum: vector dimension changed across partitions " +
        s"(${buf.dim} vs ${other.dim})")
    var d = 0
    while (d < buf.dim) {
      addPair128(buf.acc, d, other.acc(2 * d), other.acc(2 * d + 1))
      d += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    if (buf.dim < 0) return null
    val out = new Array[Any](buf.dim)
    var d = 0
    while (d < buf.dim) {
      val hi = buf.acc(2 * d)
      val lo = buf.acc(2 * d + 1)
      val unscaled = BigInteger.valueOf(hi).shiftLeft(64)
        .add(new BigInteger(1, longBytes(lo)))
      val dec = Decimal(new JBigDecimal(unscaled, 12))
      require(dec.changePrecision(38, 12),
        "graft_vector_dsum: sum exceeds decimal(38,12)")
      out(d) = dec
      d += 1
    }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.dim)
    if (buf.dim >= 0) { var i = 0; while (i < buf.acc.length) { o.writeLong(buf.acc(i)); i += 1 } }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dim = in.readInt()
    if (dim < 0) new Buffer(-1, null)
    else {
      val acc = new Array[Long](2 * dim)
      var i = 0
      while (i < acc.length) { acc(i) = in.readLong(); i += 1 }
      new Buffer(dim, acc)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorDecimalSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorDecimalSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorDecimalSumAgg =
    copy(child = newChildren.head)
}

object VectorDecimalSumAgg {

  /** dim = -1 until the first row lands; acc holds (hi, lo) 128-bit
    * scaled-by-1e12 integer sums, 2 longs per dimension.
    */
  final class Buffer(var dim: Int, var acc: Array[Long])

  /** |x| bound above which round(x · 1e12) no longer fits a signed long.
    * Normalized-embedding components are O(1); anything near this bound
    * is corrupt input, and overflowing silently would skew a centroid.
    */
  private val MaxAbs = 9.2e6

  /** Exactly Spark's `cast(double AS decimal(38,12))` rounding
    * (Decimal.fromDouble → BigDecimal.valueOf → HALF_UP), returned as the
    * scaled integer x · 1e12.
    */
  private def scaled12(x: Double): Long = {
    require(!x.isNaN && math.abs(x) <= MaxAbs,
      s"graft_vector_dsum: element $x outside the exact-sum domain " +
        s"(|x| <= $MaxAbs, finite)")
    JBigDecimal.valueOf(x).setScale(12, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** acc[d] += v (v sign-extended to 128 bits). */
  private def add128(acc: Array[Long], d: Int, v: Long): Unit =
    addPair128(acc, d, v >> 63, v)

  /** acc[d] += (hi, lo) with unsigned-carry propagation. */
  private def addPair128(acc: Array[Long], d: Int, hi: Long, lo: Long): Unit = {
    val oldLo = acc(2 * d + 1)
    val newLo = oldLo + lo
    // carry out of the low word: unsigned overflow test
    val carry = if (java.lang.Long.compareUnsigned(newLo, oldLo) < 0) 1L else 0L
    acc(2 * d + 1) = newLo
    acc(2 * d) = acc(2 * d) + hi + carry
  }

  private def longBytes(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }
}
