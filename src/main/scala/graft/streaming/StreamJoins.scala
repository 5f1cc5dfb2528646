package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw (unaggregated) stream-stream operators — the two stateful stream
  * capabilities the mood chain doesn't exercise: an event-time INTERVAL
  * join between two live streams, and watermark-bounded streaming
  * deduplication. Both bound their state by watermarks, so they run
  * indefinitely at any input rate; neither is expressible as a batch-per-
  * micro-batch foreachBatch trick (matches can span micro-batches).
  */
object StreamJoins {

  /** Event-time interval join of two streams: each `purchases` row pairs
    * with every `clicks` row of the same user whose click time falls in
    * [purchase_ts − windowMinutes, purchase_ts]. Both sides are watermarked
    * with the window width, which is exactly the bound Spark needs to evict
    * join state (a click older than the watermark can never match a future
    * purchase). Append mode; works on batch frames too (same API).
    *
    * Inputs: clicks(user_id, ts, value), purchases(user_id, ts, value).
    */
  def purchasesWithRecentClicks(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val p = purchases
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", s"$windowMinutes minutes")
    p.join(c, expr(
      s"""c_user = user_id AND
          click_ts >= purchase_ts - INTERVAL $windowMinutes MINUTES AND
          click_ts <= purchase_ts"""))
      .select(col("user_id"), col("purchase_ts"), col("purchase_value"),
        col("click_ts"), col("click_value"))
  }

  /** Watermark-bounded streaming deduplication on a business key: the
    * streaming analog of exact dedup — state holds only keys younger than
    * the watermark (dropDuplicatesWithinWatermark), so duplicate events
    * arriving within the lateness bound are suppressed with O(window) state
    * instead of O(stream) (plain dropDuplicates would retain every key
    * forever).
    */
  def dedupeEvents(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
