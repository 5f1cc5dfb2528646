package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.ops.Parse

/** Source abstraction (SURVEY.md §7 module 4): pipelines are parameterized
  * by a Source so tests run hermetically on files/memory while production
  * wires Kafka — the reference hard-codes
  * `readStream.format("kafka").option("subscribe", topic)` in every job
  * (jobs/spark_mood_tracker.py:28-33); we invert that dependency.
  *
  * A Kafka implementation is a drop-in (`format("kafka")` + Parse.ingest on
  * `value`) but is NOT compiled here: the spark-sql-kafka connector jar is
  * deliberately absent from this hermetic build (zero-egress).
  */
trait EventSource {
  /** Streaming frame of parsed events with the given schema. */
  def stream(spark: SparkSession, schema: StructType): DataFrame
  /** Batch frame with the same contents (for backfill / tests / oracle). */
  def batch(spark: SparkSession, schema: StructType): DataFrame
}

/** NDJSON event files (one JSON object per line, like a Kafka topic dump). */
final class JsonFileSource(path: String) extends EventSource {
  def stream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)
  def batch(spark: SparkSession, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

/** Raw Kafka-shaped frames (binary `value` column) from any format — applies
  * the engine's cast→from_json→flatten ingest chain (P1–P3).
  */
object RawIngest {
  def apply(raw: DataFrame, schema: StructType): DataFrame = Parse.ingest(raw, schema)
}
