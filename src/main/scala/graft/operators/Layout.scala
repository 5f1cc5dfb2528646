package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management — the operator a 100 TB table needs between
  * ingest and query: small-file compaction into a partition-pruned,
  * sorted-within-file layout. A streaming ingest (one file per
  * micro-batch task) leaves thousands of KB-sized files per day;
  * every downstream scan then pays file-open overhead and loses
  * row-group skipping. Rewriting `partitionBy(day)` with the frame
  * repartitioned ON the partition column gives exactly one file per
  * day (hash-partitioning sends each day to one task), and sorting
  * within partitions gives monotone min/max column chunks so parquet
  * row-group stats prune range predicates inside the day too.
  */
object Layout {

  /** Rewrite `df` under `outDir` partitioned by day(`tsCol`), one file
    * per day, rows sorted by `sortCol` within each file. Returns the
    * rewritten table (read back through the partition-pruned layout).
    *
    * At 100 TB a single file per day may exceed the healthy file size;
    * `maxRecordsPerFile` > 0 rolls each day's (still sorted) stream
    * into bounded files — Spark's native knob, deterministic given the
    * sort, and the day partition still prunes. (A salt-column
    * repartition is NOT used: hash partitioning gives no guarantee
    * distinct salts land on distinct tasks, so the file count would be
    * nondeterministic.)
    */
  def compactByDay(
      df: DataFrame,
      tsCol: String,
      sortCol: String,
      outDir: String,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    df.withColumn("day", to_date(col(tsCol)))
      .repartition(col("day"))
      .sortWithinPartitions(col("day"), col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("day").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Per-day layout audit of a day-partitioned parquet table: row
    * count, `idCol` bounds, file count. `input_file_name()` is
    * evaluated at the scan, so the file count is read off the same
    * distributed pass that counts the rows — no filesystem listing
    * on the driver.
    */
  def auditByDay(table: DataFrame, idCol: String): DataFrame =
    table
      .select(col("day"), col(idCol), input_file_name().as("f"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(idCol)).as(s"min_$idCol"),
        max(col(idCol)).as(s"max_$idCol"),
        countDistinct(col("f")).as("n_files"))
}
