package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native typed-imperative aggregate —
  * the CANDIDATE-GENERATION half of the sketch-then-verify heavy-hitter
  * operator (`graft.operators.HeavyHitters`). Each partition folds its
  * items into at most `k` counters (classic decrement-on-overflow); partial
  * sketches merge by counter addition followed by the (k+1)-th-largest
  * subtraction (Agarwal et al., "Mergeable Summaries", PODS 2012), which
  * preserves the deterministic guarantee the operator relies on: ANY item
  * with true frequency > n/k is present in the merged sketch. Items the
  * sketch keeps that are NOT that frequent are possible — the operator's
  * exact-recount pass removes them, so sketch internals never reach a gate.
  *
  * Why this shape at 100 TB: the alternative (count every distinct token,
  * then filter) shuffles the full vocabulary; the sketch reduces each of
  * ~thousands of map partitions to ≤ k counters before any exchange, and
  * the recount pass shuffles only the ≤ k surviving candidate tokens.
  *
  * Buffer = open-addressed-enough mutable HashMap living as a boxed object
  * (ObjectHashAggregate), serialized to (count, [len, utf8-bytes, long]*)
  * only at shuffle boundaries.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k > 0, "MisraGriesAgg needs a positive counter budget")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      buf.get(tok) match {
        case Some(c) => buf.update(tok, c + 1)
        case None =>
          if (buf.size < k) buf.update(tok, 1L)
          else decrementAll(buf, 1L)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: add counters, then restore the k-counter
    * bound by subtracting the (k+1)-th largest count from every counter
    * and dropping the non-positive ones. Skipping the subtraction when
    * already within budget keeps first-batch merges lossless.
    */
  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (tok, c) =>
      buf.update(tok, buf.getOrElse(tok, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - k - 1))
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.mapValuesInPlace((_, c) => c - by)
    buf.foreach { case (tok, c) => if (c <= 0) dead += tok }
    dead.foreach(buf.remove)
  }

  /** Candidates sorted by token for a deterministic (if ever inspected)
    * order; counts are SKETCH counts — lower bounds, not frequencies.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy(_._1).map { case (tok, c) =>
      InternalRow(UTF8String.fromString(tok), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]]): ArrayData
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (tok, c) =>
      val b = tok.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
