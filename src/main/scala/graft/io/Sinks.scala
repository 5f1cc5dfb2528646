package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}

/** Sink abstraction (SURVEY.md §2.2): the reference writes every stream to
  * MongoDB via a driver-side `toPandas()` collect per micro-batch
  * (jobs/spark_mood_tracker.py:115-126) and batch tiers to Postgres/S3.
  * Here every write is a distributed Spark write; external systems
  * (JDBC/Mongo/S3) plug in behind the same trait via their standard
  * DataFrameWriter formats without touching pipeline code.
  */
trait BatchSink {
  def write(df: DataFrame): Unit
}

/** Parquet append table — the engine's stand-in for the reference's Mongo
  * collections (K1) and Postgres tables (K3).
  */
final class ParquetSink(path: String) extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode("append").parquet(path)
}

/** NDJSON export (K4) and object-store upload (K5): `df.write.json` IS
  * newline-delimited JSON, replacing the reference's row-at-a-time
  * `json.dumps` loop (my_airflow/dags/mongo_to_storage.py:102-104) and its
  * separate boto3 upload step (`:28-42`) with ONE distributed write. The
  * path is any Hadoop-FS URI: `file:///...` locally, `s3a://bucket/exports/
  * ...` in production (requires hadoop-aws + credentials on the cluster —
  * absent from this zero-egress build; scheme dispatch itself is tested
  * with an explicit file:// URI). Executors write partitions straight to
  * the store — no driver-side staging file, no 5 GB single-PUT ceiling.
  */
final class NdjsonSink(path: String) extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode("overwrite").json(path)
}

/** K3 — JDBC append (Postgres in the reference, any JDBC target here).
  * Uses Spark's built-in distributed JDBC writer (one connection per
  * partition) instead of the reference's driver-side row loop. Driven
  * end-to-end in JdbcRoundTripSpec through embedded Derby (batch append
  * and checkpointed streaming foreachBatch); no NETWORKED database exists
  * in this build, so fixtures stand in for Postgres itself.
  */
final class JdbcSink(url: String, table: String, props: java.util.Properties)
    extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode("append").jdbc(url, table, props)
}

object Sinks {

  /** K6 — destructive cleanup after a successful export (the reference's
    * delete_many + os.remove): removes a filesystem table path via the
    * Hadoop FS API (works for local and distributed filesystems alike).
    */
  def truncatePath(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) || fs.delete(p, true)
  }
  /** K1-analog streaming sink: checkpointed foreachBatch into any BatchSink. */
  def streamInto(df: DataFrame, sink: BatchSink, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) => sink.write(batch) }

  /** K2: console debug sink (truncate=false like the reference). */
  def console(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").option("truncate", "false")
}
