package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest-side projections: binary→string cast, schema-checked JSON parse,
  * struct flatten (reference P1–P4: jobs/spark_mood_tracker.py:35-62,
  * jobs/spark_traffic_consumer.py:23-25).
  *
  * All functions are pure `DataFrame => DataFrame` so they compose identically
  * under batch and Structured Streaming. `from_json` with an explicit schema
  * keeps PERMISSIVE semantics: malformed/missing fields become nulls, never
  * errors — the behavior the reference relies on.
  */
object Parse {

  /** P1: Kafka-style binary `value` column → UTF-8 string. */
  def castValueToString(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(col(valueCol).cast("string").as("value"))

  /** P2+P3: parse a JSON string column against an explicit schema and flatten
    * the transient struct — one codegen'd projection, no intermediate
    * materialization.
    */
  def parseJson(df: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol), schema).as("data")).select(col("data.*"))

  /** Full ingest chain for one topic: cast → parse → flatten. */
  def ingest(raw: DataFrame, schema: StructType): DataFrame =
    parseJson(castValueToString(raw), schema)

  /** P7: drop rows captured as corrupt by a PERMISSIVE JSON scan
    * (reference: my_airflow/dags/mongo_to_storage.py:53-54).
    */
  def dropCorrupt(df: DataFrame, corruptCol: String = "_corrupt_record"): DataFrame =
    if (df.columns.contains(corruptCol))
      df.filter(col(corruptCol).isNull).drop(corruptCol)
    else df
}
