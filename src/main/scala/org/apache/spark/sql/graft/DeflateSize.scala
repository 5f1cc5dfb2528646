package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[DeflateSize]]: raw-deflate (`nowrap = true`, no
  * zlib header/trailer) the string's UTF-8 bytes at the default level
  * and return the compressed byte count. One short-lived Deflater per
  * call — `end()` is called explicitly because the native zlib buffer
  * is NOT collected with the Java object promptly enough under a
  * billion-row scan; the output is drained into a scratch buffer and
  * only COUNTED, never kept, so the kernel allocates O(8 KiB) per call
  * regardless of document size.
  */
object DeflateUtil {
  def deflatedSize(s: UTF8String): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Codegen'd raw-deflate size of a string's UTF-8 bytes — the kernel
  * under the compression-ratio quality signal (Gopher-class rule sets
  * gate on it: natural language deflates to ~40–65% of its raw size,
  * while repeated boilerplate, floods, and template spam collapse far
  * below — redundancy that char-level entropy (q164) misses because
  * the CHARACTER distribution of repeated text is unchanged).
  *
  * A Scala UDF would work but costs the UDF serialization wall in
  * every plan that uses it; this is a proper unary expression with
  * `doGenCode`, so the ratio computation stays inside whole-stage
  * codegen and the operator is map-only on the scan.
  *
  * Determinism: a fixed (input, level, strategy, nowrap) tuple
  * deflates identically on a given zlib build — stable within a run
  * and across runs on one JVM, which is what the in-query
  * certification gate (q184) relies on; the byte count is never
  * compared across engines.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override def nullSafeEval(s: Any): Any =
    DeflateUtil.deflatedSize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeflateUtil.deflatedSize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateSize = copy(child = newChild)
}
