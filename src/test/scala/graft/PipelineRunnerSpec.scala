package graft

import graft.pipeline.PipelineRunner._

/** Orchestration semantics: retries, failure callback, dependency
  * skipping, deterministic topo order — plus one end-to-end DAG driving
  * real engine steps.
  */
class PipelineRunnerSpec extends SparkSpec {

  test("retry-then-succeed: flaky task succeeds within policy") {
    var calls = 0
    val p = Pipeline("p", Seq(Task("flaky")(() => {
      calls += 1
      if (calls < 3) sys.error(s"boom $calls")
    })), retry = RetryPolicy(retries = 2))
    val r = p.run()
    assert(r.succeeded)
    assert(r("flaky").attempts == 3 && r("flaky").status == Succeeded)
  }

  test("terminal failure invokes the callback with the reference message shape") {
    var captured: Option[FailureContext] = None
    val p = Pipeline("mood_dag", Seq(Task("bad")(() => sys.error("nope"))),
      retry = RetryPolicy(retries = 1), onFailure = ctx => captured = Some(ctx))
    val r = p.run()
    assert(!r.succeeded && r("bad").attempts == 2)
    assert(captured.exists(c => c.task == "bad" && c.pipeline == "mood_dag"))
    val msg = formatFailure(captured.get)
    assert(msg.contains("`bad`") && msg.contains("`mood_dag`") && msg.contains("nope"))
  }

  test("cleanup runs only after BOTH writers succeed; failure skips it") {
    var order = Vector.empty[String]
    def mk(fail: Boolean) = {
      order = Vector.empty
      moodExportDag("mood_dag",
        exportTask = () => order :+= "export",
        loadWarehouse = () => {
          order :+= "warehouse"
          if (fail) sys.error("warehouse down")
        },
        uploadStore = () => order :+= "store",
        cleanup = () => order :+= "cleanup",
        onFailure = _ => ()).run()
    }
    val ok = mk(fail = false)
    assert(ok.succeeded)
    assert(order == Vector("export", "warehouse", "store", "cleanup"))
    val bad = mk(fail = true)
    assert(order == Vector("export", "warehouse", "store")) // no cleanup
    assert(bad("cleanup").status == Skipped && bad("cleanup").attempts == 0)
    assert(bad("upload_to_store").status == Succeeded) // independent branch ran
    assert(bad("load_to_warehouse").status == Failed)
  }

  test("failed root skips all transitive dependents") {
    val p = moodExportDag("d", () => sys.error("export broke"),
      () => (), () => (), () => (), onFailure = _ => ())
    val r = p.run()
    assert(r("export_to_file").status == Failed)
    assert(r("load_to_warehouse").status == Skipped)
    assert(r("upload_to_store").status == Skipped)
    assert(r("cleanup").status == Skipped)
  }

  test("DAG drives real engine steps: gate → export → ndjson+warehouse → cleanup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("dag_e2e")
    val mood = Seq(
      ("2024-03-05 10:00:00", "komitas", 42.0, 11.0, "clear", "neutral", "relaxed"),
      ("2024-03-05 11:00:00", "kentron", 33.0, 7.0, "rain_slight", "positive", "normal"))
      .toDF("event_time", "intersection", "avg_speed", "avg_temp", "weather",
        "sentiment", "mood")
      .withColumn("event_time", to_timestamp(col("event_time")))
    var exported = 0L
    val dag = moodExportDag("mood_to_storage",
      exportTask = () => new graft.io.NdjsonSink(s"$dir/export").write(mood),
      loadWarehouse = () => {
        val res = graft.pipeline.ExportPipeline.loadNdjson(
          spark, s"$dir/export", new graft.io.ParquetSink(s"$dir/warehouse"))
        exported = res.written
      },
      uploadStore = () => new graft.io.ParquetSink(s"$dir/store").write(mood),
      cleanup = () => { graft.io.Sinks.truncatePath(spark, s"$dir/export"); () })
    val report = dag.run()
    assert(report.succeeded, report.results.mkString(";"))
    assert(exported == 2L)
    assert(spark.read.parquet(s"$dir/warehouse").count() == 2)
    assert(spark.read.parquet(s"$dir/store").count() == 2)
    assert(!new java.io.File(s"$dir/export").exists()) // cleanup ran last
  }

  test("cycles and unknown deps rejected; schedule metadata carried") {
    intercept[IllegalArgumentException] {
      Pipeline("c", Seq(Task("a", Seq("b"))(() => ()), Task("b", Seq("a"))(() => ()))).run()
    }
    intercept[IllegalArgumentException] {
      Pipeline("u", Seq(Task("a", Seq("ghost"))(() => ())))
    }
    assert(moodExportDag("d", () => (), () => (), () => (), () => ())
      .schedule.contains("@daily"))
  }
}
