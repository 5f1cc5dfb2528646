package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Micro-benchmark: codegen'd StableHash60 expression vs the declarative
  * md5→substring→conv reference, over the sf0.1 shingle corpus in one JVM
  * (back-to-back, so box contention cancels). Steady state measured
  * ~1.6×: 0.16 s vs 0.26 s per 1.45M shingles (2026-08-12).
  */
object HashAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
        args.headOption.getOrElse("/root/testdata/sf0.1") + "/documents.parquet")
      .repartition(32)
      .select(col("doc_id"), TextFunctions.normalized(col("text")).as("nt"))
      .select(col("doc_id"), TextFunctions.charShinglesOfNorm(col("nt"), 7).as("sh"))
      .select(explode(col("sh")).as("s")).persist()
    println(s"shingles: ${docs.count()}")
    def time(name: String, c: org.apache.spark.sql.Column): Unit =
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        // field-reduce before summing: raw 60-bit values overflow an ANSI sum
        docs.select(sum(pmod(c, lit(1000000007L)))).head()
        println(f"$name run$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("fast  ", TextFunctions.stableHash60(col("s")))
    time("ref   ", TextFunctions.stableHash60Reference(col("s")))
    time("fast2 ", TextFunctions.stableHash60(col("s")))
    spark.stop()
  }
}
