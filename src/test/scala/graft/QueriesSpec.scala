package graft

/** Smoke: every declared query runs at sf0.001 and yields a sane frame.
  * (Value-level correctness is the driver's DuckDB gate plus the per-operator
  * suites; this catches schema drift / plan-time regressions early.)
  */
class QueriesSpec extends SparkSpec {

  // Queries whose result may legitimately be empty at the smallest SF.
  private val mayBeEmpty = Set("q20_lsh_candidate_pairs", "q24_embedding_near_dups",
    "q21_jaccard_pairs")

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"oracleSql without a query impl: $unknown")
  }

  test("every query is oracle-checked — no rows-only queries remain") {
    // Round 6 closed the last rows-only cell (q27 now dumps its in-query
    // certification vs brute force); any new query must register DuckDB
    // SQL in Oracles.all or re-introduce a declared set with a documented
    // reason.
    val unchecked = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unchecked.isEmpty, s"queries without an oracle: $unchecked")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("q39: merged daily HLL sketches track exact distinct counts (<2% err)") {
    // sketchEstimates is the production single-scan frame — it exposes the
    // raw estimate, so the tight error bound is asserted here.
    val approx = Queries.sketchEstimates(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_events"))).toMap
    val exact = Queries.distinctUsers(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (nUsers, nEvents)) =>
      val (aUsers, aEvents) = approx(k)
      assert(aEvents == nEvents) // counts are exact either way
      assert(math.abs(aUsers - nUsers).toDouble / nUsers < 0.02,
        s"$k: sketch $aUsers vs exact $nUsers")
    }
  }

  test("q27: certification dump — one row per query, every bound TRUE") {
    val rows = Queries.annLshCertified(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L))
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_returned") == 5L, s"q$q: top-k under-filled")
      assert(r.getAs[Boolean]("found_exact_neighbor"), s"q$q: zero recall")
      assert(r.getAs[Boolean]("cosine_exact_ok"), s"q$q: cosine re-derivation drift")
      assert(r.getAs[Boolean]("within_exact_bounds"), s"q$q: cosine above true max")
      assert(r.getAs[Boolean]("corpus_recall_at_5_ok"), s"q$q: corpus recall under 0.5")
    }
  }

  test("q39: certified gate dump matches exact counts and the 5% bound holds") {
    val rows = Queries.sketchProfile(spark, sf0001).collect()
    val exact = Queries.distinctUsers(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"))).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == exact.keySet)
    rows.foreach { r =>
      val k = r.getAs[String]("event_type")
      assert(r.getAs[Boolean]("estimate_within_5pct"), s"$k: bound violated")
      assert(r.getAs[Long]("n_users_exact") == exact(k)._1)
      assert(r.getAs[Long]("n_events") == exact(k)._2)
    }
  }
}
