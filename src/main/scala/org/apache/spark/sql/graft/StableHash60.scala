package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[StableHash60]]: md5 of the UTF-8 bytes, first 60
  * bits (= first 15 hex chars) as a non-negative long — bit-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (property-tested against it)
  * without materializing the 32-char hex string, the substring copy, or
  * the base-16 reparse. MessageDigest instances are thread-local (they are
  * stateful and not thread-safe; allocation per call would dominate).
  */
object HashUtil {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def hash60(bytes: Array[Byte]): Long = hash60(bytes, 0, bytes.length)

  /** As [[hash60]] over a slice — lets per-n-gram callers hash straight
    * out of one backing array with zero per-gram copies.
    */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    // first 15 hex nibbles: bytes 0..6 whole + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Codegen'd 60-bit stable string hash — the base hash under every
  * minhash/LSH/simhash/fingerprint/sampling operator (see
  * `graft.functions.TextFunctions.stableHash60`). The declarative form
  * (`md5 → substring → conv → cast`) allocates a hex string and reparses
  * it per evaluation — per SHINGLE in the dedup/fingerprint paths, which
  * evaluate it millions of times per task. This expression computes the
  * same 60 bits straight from the digest inside whole-stage codegen.
  */
case class StableHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_stable_hash60"

  override def nullSafeEval(s: Any): Any =
    HashUtil.hash60(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.HashUtil.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): StableHash60 =
    copy(child = newChild)
}
