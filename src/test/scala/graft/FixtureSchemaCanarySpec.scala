package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration: the corpus has already
  * shipped `events.ts` as parquet TIMESTAMP(NANOS) (reads as a raw Long
  * under `nanosAsLong`) and later as TIMESTAMP_MICROS/isAdjustedToUTC=0
  * (reads as TIMESTAMP_NTZ). `Tables.normalizeTs` must yield the SAME
  * TimestampType rows from every encoding, so the whole 27-query events
  * surface survives the next fixture flip. If the driver introduces a
  * THIRD encoding this spec fails loudly instead of 60 downstream tests.
  */
class FixtureSchemaCanarySpec extends SparkSpec {
  import spark.implicits._

  // one late-2025 instant with sub-second detail, one exact second
  private val microsA = 1767225600123456L // 2026-01-01 00:00:00.123456 UTC
  private val microsB = 1767312000000000L // 2026-01-02 00:00:00 UTC

  private def tsOf(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private def expected: Set[(Long, Timestamp)] =
    Set((1L, tsOf(microsA)), (2L, tsOf(microsB)))

  private def roundTrip(dfWriter: String => Unit): Set[(Long, Timestamp)] = {
    val dir = tmpDir("canary_events")
    dfWriter(dir)
    val raw = spark.read.parquet(dir)
    Tables.normalizeTs(raw)
      .select(col("id"), col("ts"))
      .as[(Long, Timestamp)]
      .collect()
      .toSet
  }

  test("normalizeTs: int64-nanos encoding (legacy corpus) → TimestampType rows") {
    val got = roundTrip { dir =>
      // the old fixture reads as a raw Long of nanos under nanosAsLong;
      // writing a plain LongType column reproduces exactly that read schema
      Seq((1L, microsA * 1000L), (2L, microsB * 1000L))
        .toDF("id", "ts")
        .write.mode("overwrite").parquet(dir)
    }
    assert(got === expected)
  }

  test("normalizeTs: TIMESTAMP_MICROS ntz encoding (2026-08-13 corpus) → same rows") {
    val got = roundTrip { dir =>
      // Spark writes TimestampNTZType as TIMESTAMP_MICROS isAdjustedToUTC=0 —
      // byte-identical to what the regenerated driver fixtures carry
      Seq((1L, microsA), (2L, microsB))
        .toDF("id", "us")
        .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
        .select(col("id"), col("ts"))
        .write.mode("overwrite").parquet(dir)
    }
    assert(got === expected)
  }

  test("normalizeTs: already-TimestampType encoding passes through unchanged") {
    val got = roundTrip { dir =>
      Seq((1L, microsA), (2L, microsB))
        .toDF("id", "us")
        .select(col("id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(dir)
    }
    assert(got === expected)
  }

  test("Tables.events yields TimestampType against the live corpus, whatever its encoding") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
  }
}
