package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge

import graft.ops.Classify

/** SQL-surface registration: exposes the engine's classifiers, text
  * utilities, and vector kernels to `spark.sql(...)` users so the full
  * reference workload is reachable from pure SQL as well as the
  * DataFrame API. Idempotent per session.
  */
object GraftFunctions {

  private def fromCols(name: String, arity: Int, f: Seq[Column] => Column)(
      spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        ColumnBridge.expression(f(exprs.map(ColumnBridge.column)))
      },
      "scala_udf")

  /** Register every graft SQL function on the session. */
  def register(spark: SparkSession): Unit = {
    fromCols("mood_label", 3, cs => Classify.moodLabel(cs(0), cs(1), cs(2)))(spark)
    fromCols("classify_news", 1, cs => Classify.newsSentiment(cs(0)))(spark)
    fromCols("traffic_condition", 1, cs => Classify.trafficCondition(cs(0)))(spark)
    fromCols("graft_dot", 2, cs => VectorFunctions.dot(cs(0), cs(1)))(spark)
    fromCols("graft_cosine", 2, cs => VectorFunctions.cosine(cs(0), cs(1)))(spark)
    fromCols("graft_norm", 1, cs => VectorFunctions.norm(cs(0)))(spark)
    fromCols("doc_fingerprint", 1, cs => TextFunctions.fingerprint(cs(0)))(spark)
    fromCols("token_count", 1, cs => TextFunctions.tokenCount(cs(0)))(spark)
    fromCols("lang_id", 1, cs => TextFunctions.langId(cs(0)))(spark)
    fromCols("graft_l2_normalize", 1, cs => VectorFunctions.l2Normalize(cs(0)))(spark)
    fromCols("graft_quantize_int8", 1, cs => VectorFunctions.quantizeInt8(cs(0)))(spark)
    fromCols("graft_dequantize_int8", 1, cs => VectorFunctions.dequantizeInt8(cs(0)))(spark)
    fromCols("graft_stable_hash60", 1, cs => TextFunctions.stableHash60(cs(0)))(spark)
    fromCols("graft_bpe_token_count", 1, cs => TextFunctions.bpeTokenCount(cs(0)))(spark)
  }
}
