package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a string column against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public sketch
  * library, the same family the engine's `DataFrame.stat.bloomFilter`
  * builder returns).
  *
  * Scale rationale: in the incremental-ingest dedup loop the batch is
  * anti-joined against the accumulated fingerprint store
  * ([[graft.operators.Dedup.dedupeIncrementalStaged]]). At corpus scale
  * the overwhelming majority of a fresh batch's fingerprints are NEW —
  * yet a plain anti-join shuffles every one of them to meet the store's
  * partitioning. A bloom filter built from the store (16 bytes/doc → a
  * few bits/doc) is a SOUND prefilter: a negative probe proves the
  * fingerprint is not in the store, so only bloom-positive rows (true
  * duplicates + the configured false-positive sliver) need the exact
  * anti-join. The probe itself is map-only and lives inside whole-stage
  * codegen — no UDF, no per-row boxing.
  *
  * The filter object rides to executors as a plan reference
  * (`ctx.addReferenceObj`), exactly how Spark's own runtime row-level
  * bloom filtering ships its sketch; `BloomFilterImpl` is Serializable.
  * Probes use `mightContainBinary` over the column's UTF-8 bytes, which
  * matches the `putBinary`/`putString` write path byte-for-byte (spec
  * asserts the zero-false-negative contract against the builder).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
