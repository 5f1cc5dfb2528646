package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time derivations (reference P5/P9/P10:
  * jobs/spark_mood_tracker.py:37-38, my_airflow/dags/mongo_to_storage.py:67,
  * my_airflow/dags/daily_summary_report.py:33-34).
  */
object TimeOps {

  /** P5: minute-truncated event time — the reference's tumbling 1-minute
    * window key. Equivalent to `window($"ts", "1 minute").start`.
    */
  def truncMinute(ts: Column): Column = date_trunc("minute", ts)

  /** P4/P9: string → timestamp coercion (format "yyyy-MM-dd HH:mm:ss"). */
  def toEventTime(raw: Column): Column = to_timestamp(raw)

  /** P10, fixed for pushdown: the reference filters on
    * `date_format(ts,'yyyy-MM-dd') == day` which blocks predicate pushdown
    * into the source (daily_summary_report.py:33-34). `to_date` keeps the
    * predicate on the native column so it reaches the scan / JDBC source.
    */
  def onDay(df: DataFrame, tsCol: String, day: java.time.LocalDate): DataFrame =
    df.filter(to_date(col(tsCol)) === lit(java.sql.Date.valueOf(day)))
}
