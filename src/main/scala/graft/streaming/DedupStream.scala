package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Streaming corpus dedup — the ingest shape of a continuously-fed
  * training corpus: each micro-batch deduped against everything ever
  * ingested (the persisted [[Dedup.FingerprintStore]]), survivors
  * appended to a partitioned output corpus.
  *
  * Exactly-once from at-least-once delivery, twice over: the store
  * segment is keyed by the micro-batch id (a replay overwrites its own
  * uncommitted segment or re-derives survivors from the committed one —
  * [[Dedup.dedupeStreamStaged]]), and the survivor output lands in
  * `outDir/batch=<id>/` with overwrite mode, so the replayed epoch
  * rewrites its own directory and no other. Periodic maintenance:
  * `FingerprintStore.compact(storeDir, buckets, keepNewestSegments = 1)`
  * between epochs — the spared newest segment is the only one a replay
  * can ever need.
  *
  * At 100 TB the store is fingerprint-only (16-byte md5 + id per
  * distinct doc), the anti-join reads it co-located once compacted, and
  * the output stays a plain day/batch-partitioned parquet corpus any
  * downstream operator of this engine consumes directly.
  */
class DedupStream(
    spark: SparkSession,
    storeDir: String,
    outDir: String,
    textCol: String,
    idCol: String) {

  /** foreachBatch adapter:
    * `stream.writeStream.foreachBatch(dedup.sink()).start()`.
    * `compactEvery > 0` makes the store SELF-MAINTAINING: after every
    * Nth epoch, `FingerprintStore.compact(keepNewestSegments = 1)`
    * folds the accumulated segments into the bucketed generation —
    * the anti-join reads the store side exchange-free afterwards, and
    * the spared newest segment is the only one a replay can need.
    */
  def sink(compactEvery: Int = 0, buckets: Int = 64): (DataFrame, Long) => Unit =
    (batch, id) => {
      Dedup.dedupeStreamStaged(batch, storeDir, textCol, idCol, id)
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
        Dedup.FingerprintStore.compact(batch.sparkSession, storeDir,
          buckets, keepNewestSegments = 1): Unit
    }

  /** NEAR-dup foreachBatch adapter — the band-store twin of [[sink]]
    * ([[Dedup.dedupeNearStreamStaged]]): each micro-batch drops docs
    * whose LSH band keys are owned by any smaller-id doc ever ingested,
    * then registers its own keys. Same replay/compaction contract,
    * same `compactEvery` self-maintenance.
    */
  def nearSink(
      k: Int = 8, bands: Int = 4, ngram: Int = 2,
      compactEvery: Int = 0, buckets: Int = 64): (DataFrame, Long) => Unit =
    (batch, id) => {
      Dedup.dedupeNearStreamStaged(batch, storeDir, textCol, idCol, id, k, bands, ngram)
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
        Dedup.FingerprintStore.compact(batch.sparkSession, storeDir,
          buckets, keepNewestSegments = 1): Unit
    }

  /** The deduped corpus so far (hive-discovers the `batch` column). */
  def corpus(): DataFrame = spark.read.parquet(outDir)
}
