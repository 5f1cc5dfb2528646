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

  test("range join: binned equi-join equals the naive inequality join") {
    import graft.operators.RangeJoin
    val points = Seq(
      (1L, "2024-01-01 10:15:00"), (1L, "2024-01-01 11:59:00"),
      (1L, "2024-01-01 13:00:00"), (2L, "2024-01-01 10:15:00")
    ).toDF("k", "pt").selectExpr("k", "to_timestamp(pt) AS pt")
    val intervals = Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00", "a"), // spans 4 bins
      (1L, "2024-01-01 12:59:00", "2024-01-01 13:00:00", "b"), // end-exclusive
      (2L, "2024-01-01 11:00:00", "2024-01-01 12:00:00", "c")  // wrong window
    ).toDF("k", "st", "en", "tag")
      .selectExpr("k", "to_timestamp(st) AS st", "to_timestamp(en) AS en", "tag")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "pt", "st", "en")
      .select("k", "pt", "tag").orderBy("k", "pt").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // exactly-once per matched pair (the 10:15 point overlaps interval `a`
    // which spans several bins, but they meet only in the point's bin);
    // 13:00 excluded by the half-open end; user 2's point misses `c`
    assert(got.toSeq == Seq((1L, "a"), (1L, "a")))
    val naive = points.join(intervals, points("k") === intervals("k") &&
        $"pt" >= $"st" && $"pt" < $"en")
      .select(points("k"), $"pt", $"tag").orderBy("k", "pt").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq == naive.toSeq)
    // and the plan is an equi-join, not a nested loop
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "pt", "st", "en")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // replication guard: an interval spanning > maxBinsPerInterval bins fails
    // loudly instead of silently exploding
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "k", "pt", "st", "en",
        binSeconds = 60, maxBinsPerInterval = 10).collect()
    }
    assert(e.getMessage.contains("raise binSeconds") ||
      Option(e.getCause).exists(_.getMessage.contains("raise binSeconds")), e.getMessage)
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
