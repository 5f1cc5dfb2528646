package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[CharNgramBucketCounts]]: one pass over the
  * string, hashing every character n-gram with [[HashUtil.hash60]] into
  * `buckets` counting bins. Bit-identical to
  * `explode(charNgrams) → pmod(stableHash60(g), buckets) → count per
  * bucket` (hash60 is non-negative, so `%` IS pmod), with zero
  * per-gram string allocation on the ASCII fast path: when
  * numBytes == numChars, every n-gram is a slice of the one backing
  * array and the digest reads it in place.
  */
object NgramUtil {
  def bucketCounts(s: UTF8String, n: Int, buckets: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val nChars = s.numChars()
    val total = nChars - n + 1
    if (total > 0) {
      if (s.numBytes() == nChars) {
        val b = s.getBytes
        var i = 0
        while (i < total) {
          counts((HashUtil.hash60(b, i, n) % buckets).toInt) += 1L
          i += 1
        }
      } else {
        // multi-byte code points: char-indexed substrings (1-based,
        // matching substring()'s semantics under the declarative form)
        var i = 1
        while (i <= total) {
          counts((HashUtil.hash60(s.substringSQL(i, n).getBytes)
            % buckets).toInt) += 1L
          i += 1
        }
      }
    }
    new GenericArrayData(counts)
  }
}

/** Codegen'd character-n-gram bucket histogram — the feature-hashing
  * kernel under the model-based language ID (q147 /
  * `graft.operators.LangId`). The declarative form materializes every
  * n-gram as a string (transform+substring), explodes the corpus to one
  * ROW per gram, and hash-aggregates per document — per-gram row
  * overhead, per-gram md5 over a freshly allocated copy, and a
  * corpus-sized Generate. This expression folds the whole histogram
  * into ONE scan-side evaluation per document: the operator becomes
  * map-only (no Generate, no per-gram aggregation probes, no shuffle).
  *
  * `n` and `buckets` are construction-time constants (the model's
  * hyper-parameters), so the output is a fixed-length non-null
  * `array<long>` of bucket counts.
  */
case class CharNgramBucketCounts(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "CharNgramBucketCounts: n must be >= 1")
  require(buckets >= 1, "CharNgramBucketCounts: buckets must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngram_bucket_counts"

  override def nullSafeEval(s: Any): Any =
    NgramUtil.bucketCounts(s.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NgramUtil.bucketCounts($c, $n, $buckets)")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramBucketCounts = copy(child = newChild)
}
