package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest prior right row per key; inclusive at equal ts") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", "p1"),
      (1L, "2024-01-01 12:00:00", "p2"),
      (2L, "2024-01-01 09:00:00", "p3") // no prior right row → nulls
    ).toDF("k", "lt", "tag")
      .selectExpr("k", "to_timestamp(lt) AS lt", "tag")
    val right = Seq(
      (1L, "2024-01-01 09:30:00", 10.0),
      (1L, "2024-01-01 10:00:00", 20.0), // equal to p1's ts → matched (inclusive)
      (1L, "2024-01-01 11:00:00", 30.0),
      (2L, "2024-01-01 09:30:00", 99.0)  // after p3 → not matched
    ).toDF("k", "rt", "v")
      .selectExpr("k", "to_timestamp(rt) AS rt", "v")

    val got = AsOf.asofJoin(left, right, "k", "lt", "rt",
        Seq("v" -> "last_v", "rt" -> "last_rt"))
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("tag"),
        Option(r.getAs[Any]("last_v")), Option(r.getAs[Any]("last_rt"))))

    assert(got.toSeq == Seq(
      (1L, "p1", Some(20.0), Some(ts("2024-01-01 10:00:00"))),
      (1L, "p2", Some(30.0), Some(ts("2024-01-01 11:00:00"))),
      (2L, "p3", None, None)))
  }

  test("asofJoin preserves NULLs inside the matched right row (no fill from older rows)") {
    val left = Seq((1L, "2024-01-01 12:00:00"))
      .toDF("k", "lt").selectExpr("k", "to_timestamp(lt) AS lt")
    val right = Seq(
      (1L, "2024-01-01 10:00:00", Option(10.0)),
      (1L, "2024-01-01 11:00:00", Option.empty[Double]) // matched row: v IS NULL
    ).toDF("k", "rt", "v").selectExpr("k", "to_timestamp(rt) AS rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "lt", "rt", Seq("v" -> "last_v"))
      .collect()
    assert(got.length == 1)
    // DuckDB ASOF semantics: the matched row's null is the answer — a
    // per-column ignoreNulls fill would wrongly surface the older 10.0
    assert(got.head.isNullAt(got.head.fieldIndex("last_v")))
  }

  test("asofJoin rejects carry names clashing with left columns") {
    val left = Seq((1L, "2024-01-01 12:00:00", "keepme"))
      .toDF("k", "lt", "v").selectExpr("k", "to_timestamp(lt) AS lt", "v")
    val right = Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("k", "rt", "v").selectExpr("k", "to_timestamp(rt) AS rt", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "k", "lt", "rt", Seq("v" -> "v"))
    }
  }
}
