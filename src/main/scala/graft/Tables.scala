package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-corpus table loaders (driver parquet at /root/testdata/sf*, see
  * TESTDATA.md). Centralizes the one schema quirk: `events.ts` has been
  * written by different driver corpus generations as either parquet
  * TIMESTAMP(NANOS) (which Spark 4 only reads — as a raw Long — via the
  * `nanosAsLong` legacy conf) or TIMESTAMP_MICROS/isAdjustedToUTC=0
  * (which Spark reads as TIMESTAMP_NTZ). We adapt on the observed read
  * schema and normalize to a proper TimestampType (microsecond) column so
  * every downstream operator sees a plain timestamp, matching what the
  * DuckDB oracle sees natively.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize a raw `ts` column to TimestampType, whatever physical type
    * the corpus generation wrote it as. LongType means the nanos legacy
    * path (`ts div 1000`: integer division, exact on Long — `ts / 1000` is
    * double division and loses precision above 2^53 ns ≈ 1970+104 days);
    * anything else (TIMESTAMP_NTZ, TIMESTAMP, or a string) casts directly.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn(colName, col(colName).cast("timestamp"))
    }

  /** events with `ts` as a true TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
