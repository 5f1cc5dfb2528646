package graft.ops

import org.apache.spark.sql.DataFrame

/** Multi-stream temporal alignment (reference J1/J2:
  * jobs/spark_mood_tracker.py:78-79): left-outer equi-joins of the three
  * per-minute aggregates on the minute key.
  *
  * Scale notes: the join key is the minute-truncated event time, so both
  * sides of each join are already aggregated to at most one row per minute
  * (weather/news) or per minute x intersection (traffic). The weather/news
  * sides are tiny relative to traffic — in batch mode Catalyst broadcast-hashes
  * them automatically (AQE converts to broadcast at runtime if stats allow);
  * in streaming mode this becomes StreamingSymmetricHashJoin with
  * watermark-bounded state.
  */
object Joins {

  /** J1+J2: traffic ⟕ weather ⟕ news on event_time. */
  def alignMinutes(trafficAgg: DataFrame, weatherAgg: DataFrame, newsAgg: DataFrame): DataFrame =
    trafficAgg
      .join(weatherAgg, Seq("event_time"), "left")
      .join(newsAgg, Seq("event_time"), "left")
}
