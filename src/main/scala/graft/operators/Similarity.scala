package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact baseline: broadcast the (small) query set and
  *    stream the corpus past it once; corpus is never shuffled, so cost is
  *    O(|corpus| x |queries|) map-side work + a top-k per query. Correct at
  *    any corpus size as long as the QUERY set is broadcastable.
  *  - `lshTopK` — scale path: random-hyperplane (sign) LSH buckets both
  *    sides; only vectors sharing a bucket are compared, so the per-query
  *    candidate set is ~|corpus| / 2^bits per table. Recall is tunable via
  *    `tables` (independent hash tables, unioned).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: query_id, neighbor_id, cosine (query_id != neighbor_id).
    * Ranking is deterministic: ties broken by neighbor id after rounding
    * cosine to 6 decimals (absorbs engine-summation noise).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH bucket key(s) for each vector: one `bits`-bit signature per
    * hash table, from fixed pseudo-random hyperplanes (deterministic seed).
    */
  def lshBuckets(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      bits: Int = 8,
      tables: Int = 2,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // fixed hyperplanes: tables x bits x dim gaussians, embedded as literals
    val planes = Array.fill(tables, bits, dim)(rnd.nextGaussian())
    val v = vecs.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val tableKeys = (0 until tables).map { t =>
      val bitCols = (0 until bits).map { b =>
        val proj = (0 until dim)
          .map(i => element_at(col("v"), i + 1) * lit(planes(t)(b)(i)))
          .reduce(_ + _)
        when(proj >= 0, 1L << b).otherwise(0L)
      }
      struct(lit(t).as("table"), bitCols.reduce(_ + _).as("bucket"))
    }
    v.select(col(idCol), col("v"), explode(array(tableKeys: _*)).as("tb"))
      .select(col(idCol), col("v"), col("tb.table"), col("tb.bucket"))
  }

  /** ANN top-k via sign-LSH co-bucketing (candidate recall < 1.0 by design). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      k: Int,
      bits: Int = 8,
      tables: Int = 2): DataFrame = {
    val cb = lshBuckets(corpus, vecCol, idCol, dim, bits, tables)
      .select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("table"), col("bucket"))
    val qb = lshBuckets(queries, vecCol, idCol, dim, bits, tables)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("table"), col("bucket"))
    val cand = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
