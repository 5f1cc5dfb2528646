package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("groupSplit: every group member lands on one side; deterministic; rate tracks ppm; map-only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 600L).map(i => (i, i % 97)).toDF("doc_id", "cluster_id")
    val got = graft.operators.Sampling
      .groupSplit(df, col("cluster_id"), trainPerMillion = 800000L, salt = "s")
    val rows = got.collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[String]("split")))
    // cluster-coherent: one side per cluster — the anti-leakage contract
    assert(rows.groupBy(_._1).values.forall(_.map(_._2).toSet.size == 1))
    // deterministic under repartition
    val re = graft.operators.Sampling
      .groupSplit(df.repartition(7), col("cluster_id"), 800000L, "s")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
      .toMap
    val base = got.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toMap
    assert(re == base)
    // rate is about 80% of CLUSTERS (binomial over 97 groups)
    val trainClusters = rows.groupBy(_._1).values
      .count(_.head._2 == "train")
    assert(trainClusters > 60 && trainClusters < 95, s"$trainClusters/97")
    // extremes and bounds
    assert(graft.operators.Sampling.groupSplit(df, col("cluster_id"), 0L, "s")
      .filter(col("split") === "train").count() == 0)
    assert(graft.operators.Sampling
      .groupSplit(df, col("cluster_id"), 1000000L, "s")
      .filter(col("split") =!= "train").count() == 0)
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.groupSplit(df, col("cluster_id"), -1L, "s")
    }
    // map-only: no exchange anywhere (the split is one hash per row)
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("hash sampling is deterministic, salt-independent, and rate-accurate") {
    val ev = Tables.events(spark, sf0001).select("event_id")
    val n = ev.count().toDouble

    val a = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L)))
    val b = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L)))
    assert(a == b, "same key+salt+rate must select the identical row set")

    // a different salt draws an (almost surely) different sample at the
    // same rate — the independence property train/holdout cuts rely on
    val c = ids(Sampling.hashSample(ev, col("event_id"), lit(250000L), salt = "holdout"))
    assert(c != a)
    assert(math.abs(c.size - n * 0.25) / n < 0.05)
    assert(math.abs(a.size - n * 0.25) / n < 0.05)

    // nested rates: a lower threshold selects a SUBSET of a higher one
    // (bucket predicate is monotone) — lets one cut consistent 1%/10%/100%
    // corpus tiers where the small tier is contained in the large
    val tiny = ids(Sampling.hashSample(ev, col("event_id"), lit(50000L)))
    assert(tiny.subsetOf(a))
    assert(ids(Sampling.hashSample(ev, col("event_id"), lit(1000000L))).size == n.toLong)
  }

  test("stratifiedTopK: exactly min(k, |group|) rows, stable under partitioning") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = Sampling.stratifiedTopK(df, col("id"), col("g"), k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.groupBy(_._2).forall(_._2.length == 5))
    // a group smaller than k yields the whole group
    val small = Sampling.stratifiedTopK(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "g"),
      col("id"), col("g"), k = 5)
    assert(small.count() == 3)
    // membership is a function of (key, salt) alone — not of layout
    val re = Sampling.stratifiedTopK(df.repartition(7), col("id"), col("g"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == re.toSet)
    // the rank window runs as a WindowGroupLimit: map-side per-group
    // truncation before the exchange
    val plan = Sampling.stratifiedTopK(df, col("id"), col("g"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mixtureReweight: integer rates hit the weight formula; membership = hashSample") {
    import spark.implicits._
    val dir = tmpDir("graft_remix")
    // src0 trusted (w=3, 10 docs), src9 untrusted (w=1, 30 docs); N=40
    // rate(src0) = min(1e6, 300000*40*3 / (30*10)) = 120000 ppm... wait:
    //   (300000*40*3) div (30*10) = 36e6 div 300 = 120000
    // rate(src9) = (300000*40*1) div (30*30) = 12e6 div 900 = 13333
    val rows =
      (1L to 10L).map(i => (i, "t", "en", "src0", 1L)) ++
        (11L to 40L).map(i => (i, "t", "en", "src9", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.mixtureReweight(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.forall(r => if (r._2 == "src0") r._3 == 120000L else r._3 == 13333L))
    // membership is exactly the Sampling predicate at that rate
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val want0 = graft.operators.Sampling.hashSample(
      docs.filter($"source" === "src0"), col("doc_id"), lit(120000L), "remix")
      .select("doc_id").as[Long].collect().toSet
    val want9 = graft.operators.Sampling.hashSample(
      docs.filter($"source" === "src9"), col("doc_id"), lit(13333L), "remix")
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == (want0 ++ want9))
    // a tiny source whose target exceeds its size caps at keep-everything
    val dir2 = tmpDir("graft_remix2")
    ((1L to 1L).map(i => (i, "t", "en", "src0", 1L)) ++
      (2L to 40L).map(i => (i, "t", "en", "src9", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val rates2 = Queries.mixtureReweight(spark, dir2).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // (300000*40*3) div (30*1) = 1.2e6 → capped at 1e6: src0 fully kept
    assert(rates2.get("src0").forall(_ == 1000000L))
  }

  test("curriculumOrder: global_pos is a bijection matching a driver replay") {
    import spark.implicits._
    val dir = tmpDir("graft_curr")
    // uneven sources: a=4 docs, b=2, c=1 — rounds 3 and 4 lose sources
    Seq(
      (1L, "a b c", "en", "srcA", 5L), (2L, "d", "en", "srcA", 1L),
      (3L, "e f", "en", "srcA", 3L), (4L, "g", "en", "srcA", 1L),
      (5L, "h h h", "en", "srcB", 5L), (6L, "i", "en", "srcB", 1L),
      (7L, "j j", "en", "srcC", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.curriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // positions are exactly 1..N
    assert(got.map(_._4).sorted.toSeq == (1L to 7L).toSeq)
    // driver replay: sort each source by (ord), emit round-robin in
    // source order, skipping exhausted sources
    val bySrc = got.groupBy(_._2).view
      .mapValues(_.sortBy(_._3).map(_._1).toVector).toMap
    val maxOrd = bySrc.values.map(_.length).max
    val want = (1 to maxOrd).flatMap(o =>
      bySrc.keys.toSeq.sorted.flatMap(s => bySrc(s).lift(o - 1)))
    assert(got.sortBy(_._4).map(_._1).toSeq == want)
  }

  test("weightedPriorityTopK: exact counts, layout-stable, weight-biased, guarded") {
    import spark.implicits._
    val df = (1L to 300L)
      .map(i => (i, s"g${i % 2}", if (i % 3 == 0) 50L else 1L))
      .toDF("id", "g", "w")
    val got = Sampling.weightedPriorityTopK(
        df, col("id"), col("w"), col("g"), k = 20, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.groupBy(_._2).forall(_._2.length == 20))
    // priority == hash div weight, exactly (recompute via the same op)
    val re = Sampling.weightedPriorityTopK(
        df.repartition(7), col("id"), col("w"), col("g"), 20, "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSet == re.toSet) // membership independent of layout
    // 1/3 of rows carry 50× weight; they should dominate the sample
    val heavy = got.count(_._3 == 50L)
    assert(heavy > got.length / 2,
      s"weighting has no bite: $heavy of ${got.length} heavy rows")
    // weights clamp to >= 1 rather than dividing by zero
    val zeroW = Seq((1L, "x", 0L), (2L, "x", 5L)).toDF("id", "g", "w")
    assert(Sampling.weightedPriorityTopK(
      zeroW, col("id"), col("w"), col("g"), 5).count() == 2)
    // output-contract columns are collision-guarded
    intercept[IllegalArgumentException] {
      Sampling.weightedPriorityTopK(
        df.withColumn("priority", lit(1)), col("id"), col("w"), col("g"), 5)
    }
    // WindowGroupLimit: map-side per-group truncation before the exchange
    val plan = Sampling.weightedPriorityTopK(
        df, col("id"), col("w"), col("g"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("groupCapByScore: best-first cap per group, deterministic ties, WindowGroupLimit") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "b", 1L)).toDF("id", "g", "score")
    val got = Sampling.groupCapByScore(df, col("g"), col("score"),
        col("id"), cap = 2)
      .select("id", "g", "rk").as[(Long, String, Long)].collect().toSet
    // score 30 ties between id 1 and 3 → smaller id first; cap cuts id 4
    assert(got == Set((1L, "a", 1L), (3L, "a", 2L), (5L, "b", 1L)))
    // partitioning must not change membership
    val re = Sampling.groupCapByScore(df.repartition(7), col("g"),
        col("score"), col("id"), cap = 2)
      .select("id", "g", "rk").as[(Long, String, Long)].collect().toSet
    assert(re == got)
    // rk collision guard + map-side pre-truncation
    intercept[IllegalArgumentException] {
      Sampling.groupCapByScore(df.withColumn("rk", lit(1)), col("g"),
        col("score"), col("id"), cap = 2)
    }
    val plan = Sampling.groupCapByScore(df, col("g"), col("score"),
        col("id"), cap = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("temperatureSample: alpha<1 upweights small sources; quotas integer-exact; deterministic") {
    import spark.implicits._
    // skewed corpus: big source 400 docs, small source 25 docs
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 425L).map(i => (i, "small"))).toDF("doc_id", "source")
    def quota(n: Long, nOther: Long, budget: Long, alpha: Double): Long = {
      def wu(m: Long) = math.round(math.exp(math.log(m.toDouble) * alpha) * 1e6)
      budget * wu(n) / (wu(n) + wu(nOther))
    }
    val got = Sampling.temperatureSample(docs, "doc_id", "source",
        alpha = 0.3, budget = 100L, salt = "t")
      .select("source", "doc_id", "rk", "quota")
      .as[(String, Long, Long, Long)].collect().toSeq
    val byScr = got.groupBy(_._1).view.mapValues(_.size).toMap
    // proportional sampling would give big 94 / small 6; alpha=0.3
    // compresses the ratio to w=exp(0.3 ln n): quotas big 63 / small 30
    // (without-replacement semantics cap a source at its own size, so
    // the small source's 30-quota saturates at its 25 docs)
    assert(byScr("big") == quota(400, 25, 100, 0.3))
    assert(byScr("small") == math.min(25L, quota(25, 400, 100, 0.3)))
    assert(quota(25, 400, 100, 0.3) == 30L)
    assert(byScr("small") > 6, "alpha must upweight the small source")
    assert(got.forall { case (_, _, rk, q) => rk <= q })
    // membership is a pure function of the corpus — partitioning invisible
    val re = Sampling.temperatureSample(docs.repartition(7), "doc_id",
        "source", alpha = 0.3, budget = 100L, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(re == got.map(_._2).toSet)
    // alpha = 1 recovers (floor-exact) proportional sampling
    val prop = Sampling.temperatureSample(docs, "doc_id", "source",
        alpha = 1.0, budget = 100L, salt = "t")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(prop("big") == quota(400, 25, 100, 1.0) &&
      prop("small") == quota(25, 400, 100, 1.0))
    // corpus-scale budget: budget * __wu (~4e15 * 6e6 ≈ 2.4e22) is far
    // past Long.MaxValue — the DECIMAL(38,0) quota path must stay exact
    // instead of wrapping negative and silently dropping whole sources
    val huge = Sampling.temperatureSample(docs, "doc_id", "source",
        alpha = 0.3, budget = 4000000000000000L, salt = "t")
      .select("source", "doc_id", "rk", "quota")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(huge.size == 425, // budget >> corpus: every doc selected
      s"overflow wrapped a quota negative: kept ${huge.size}/425")
    assert(huge.forall(_._4 > 0L))
  }
}
