package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.ClusterStore

/** Streaming duplicate-cluster map — the live twin of the batch
  * [[graft.operators.ClusterStore]] ingest loop, completing the store
  * family's streaming symmetry (DedupStream : FingerprintStore ::
  * ClusterStream : ClusterStore): each micro-batch's documents join the
  * persisted cluster map via [[ClusterStore.ingestEpoch]] (history read
  * STRICTLY below the epoch, so a replayed epoch re-derives identical
  * state), and the epoch's committed map delta — new assignments plus
  * relabels of merged components — lands under `outDir/batch=<id>`
  * with overwrite, idempotent under the checkpoint's replay contract.
  *
  * `compactEvery > 0` makes the map SELF-MAINTAINING: after every Nth
  * epoch, [[ClusterStore.compact]] folds resolved map + key segments
  * into their bucketed generations, always sparing the replay horizon
  * (`keepNewestSegments = 1`), so the per-epoch contraction join reads
  * the map side exchange-free and a months-long stream holds O(1)
  * segments.
  */
class ClusterStream(
    spark: SparkSession,
    storeDir: String,
    outDir: String,
    textCol: String,
    idCol: String,
    k: Int = 8,
    bands: Int = 4,
    ngram: Int = 2) {

  /** foreachBatch adapter:
    * `stream.writeStream.foreachBatch(cs.sink()).start()`.
    */
  def sink(compactEvery: Int = 0, buckets: Int = 64): (DataFrame, Long) => Unit =
    (batch, id) => {
      ClusterStore.ingestEpoch(batch, storeDir, textCol, idCol, id,
        k, bands, ngram)
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
        ClusterStore.compact(spark, storeDir, buckets,
          keepNewestSegments = 1): Unit
    }

  /** The accumulated map: (node, component), latest-wins resolved. */
  def clusterMap(): DataFrame = ClusterStore.load(spark, storeDir)
}
