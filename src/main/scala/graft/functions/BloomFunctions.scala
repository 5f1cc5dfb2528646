package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.{BloomMightContain, ColumnBridge}
import org.apache.spark.util.sketch.BloomFilter

/** Column-level surface for bloom-sketch membership probes (see
  * [[org.apache.spark.sql.graft.BloomMightContain]] for the codegen'd
  * expression and the 100 TB rationale).
  */
object BloomFunctions {

  /** Build a bloom filter over a string column with the engine's public
    * sketch builder. One distributed aggregation pass over `df`; the
    * returned sketch is driver-held and sized `expectedItems × ~10 bits`
    * at the default 1% fpp — a 1e9-fingerprint store fits in ~1.2 GB,
    * broadcast-friendly. Callers pass the store's ROW COUNT (a
    * metadata-only read on parquet/catalog relations) as
    * `expectedItems` so the fpp target actually holds.
    */
  def bloomFor(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)

  /** `true` iff `c` MIGHT be in `bloom` — sound prefilter: a `false`
    * proves absence. Codegen'd; null input → null.
    */
  def mightContain(bloom: BloomFilter, c: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}
