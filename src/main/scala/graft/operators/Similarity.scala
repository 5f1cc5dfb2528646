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

  /** Broadcast joins preserve the probe side's input partitioning — a
    * single-file corpus means ONE task doing every cosine (measured 145 s
    * vs 6 s at sf0.1). Spread the probe side to the session's shuffle
    * parallelism; on a real multi-file/partitioned corpus this is a cheap
    * no-op-sized shuffle relative to the scan.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

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
    val c = spread(corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv")))
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
    *
    * The hyperplanes ride along as LITERAL ARRAY DATA (`typedLit`) consumed
    * by higher-order functions — one small expression tree regardless of
    * (tables × bits × dim). A naive expansion into per-dimension
    * `element_at(v,i) * w_i` terms produces a ~tables·bits·dim-node tree
    * that takes Janino minutes to compile (measured: 75 s at dim=64) and
    * re-compiles per query; this form plans in milliseconds.
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
    // fixed hyperplanes: tables x bits x dim gaussians, as literal data
    val planes: Seq[Seq[Seq[Double]]] =
      Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian())))
    val v = vecs.select(col(idCol), asDouble(col(vecCol)).as("v"))
    // per table: fold its planes into a bits-wide signature (acc*2 + signbit)
    val bucketsPerTable = transform(
      typedLit(planes),
      tp => aggregate(tp, lit(0L), (acc, plane) =>
        acc * 2 + when(dot(col("v"), plane) >= 0, 1L).otherwise(0L)))
    v.select(col(idCol), col("v"),
        posexplode(bucketsPerTable).as(Seq("table", "bucket")))
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
    val cb = lshBuckets(spread(corpus), vecCol, idCol, dim, bits, tables)
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

  /** IVF (inverted-file) ANN — the classic large-corpus index: partition
    * the corpus into `nlist` KMeans cells (MLlib, trained on a bounded
    * sample), then answer each query by scanning only its `nprobe` nearest
    * cells. Corpus cell assignment is a one-off map pass (at 100 TB it is
    * materialized as a partitioned table keyed by cell); the per-query
    * candidate set shrinks by ~nprobe/nlist. With nprobe = nlist the result
    * is EXACTLY bruteForceTopK (verified in tests).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      fitSampleRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = spread(corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv")))
      .withColumn("features", array_to_vector(col("cv")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
      .fit(c.limit(fitSampleRows))
    val assigned = model.transform(c)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"))

    // nearest nprobe cells per query via the literal-data centroid pattern
    // (see lshBuckets: literal arrays + HOFs, never a per-dim expression tree)
    val centers: Seq[Seq[Double]] = model.clusterCenters.toSeq.map(_.toArray.toSeq)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cellDists = transform(typedLit(centers), ctr =>
      aggregate(zip_with(col("qv"), ctr, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    val probes = q
      .withColumn("cells",
        slice(transform(array_sort(zip_with(cellDists,
            sequence(lit(0), lit(nlist - 1)),
            (d, i) => struct(d.as("d"), i.as("cell")))),
          s => s.getField("cell")), 1, nprobe))
      .select(col("query_id"), col("qv"), explode(col("cells")).as("cell"))

    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
