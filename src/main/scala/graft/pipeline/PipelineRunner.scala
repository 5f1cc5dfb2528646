package graft.pipeline

/** Orchestration tier — the engine-side analog of the reference's Airflow
  * layer: 4 DAGs with cron schedules, per-task retries, a Slack failure
  * webhook, and `TriggerDagRunOperator` chaining
  * (my_airflow/dags/mongo_to_storage.py:110-147 — `export >>
  * [load_postgres, upload_s3] >> cleanup`, `on_failure_callback`;
  * daily_summary_report.py:10-11 — `retries`/`retry_delay`;
  * my_airflow/utils/slack.py:5-24 — webhook notifier).
  *
  * This is deliberately a THIN deterministic runner, not a scheduler
  * re-implementation: tasks execute sequentially in topological order
  * (parallelism at 100 TB lives INSIDE each Spark job across executors, not
  * across driver-side task threads), `schedule` is carried as metadata for
  * an external cron/scheduler to act on, and the failure callback is a
  * pluggable seam — the reference's Slack webhook POST is one
  * implementation a deployment can drop in; nothing here performs I/O.
  */
object PipelineRunner {

  /** Per-task retry policy (`retries` RE-tries after the first attempt, so
    * a task runs at most `retries + 1` times; `delayMs` between attempts —
    * the reference's `retry_delay`).
    */
  final case class RetryPolicy(retries: Int = 0, delayMs: Long = 0L)

  /** A DAG node: `run` executes only after every task in `deps` has
    * SUCCEEDED (the `[a, b] >> c` edge); a failed or skipped dependency
    * skips this task transitively.
    */
  final case class Task(name: String, deps: Seq[String] = Nil)(val run: () => Unit)

  /** What happened to one task. `attempts` counts executions (0 when
    * skipped); `error` is the LAST attempt's failure.
    */
  final case class TaskResult(
      name: String, status: TaskStatus, attempts: Int, error: Option[Throwable])

  sealed trait TaskStatus
  case object Succeeded extends TaskStatus
  case object Failed extends TaskStatus
  case object Skipped extends TaskStatus

  final case class FailureContext(
      pipeline: String, task: String, attempts: Int, error: Throwable)

  final case class RunReport(pipeline: String, results: Seq[TaskResult]) {
    def succeeded: Boolean = results.forall(_.status == Succeeded)
    def apply(task: String): TaskResult = results.find(_.name == task).get
  }

  /** The reference's Slack message shape (my_airflow/utils/slack.py:16-21),
    * minus the HTTP POST: a deployment's callback sends `format(ctx)` to
    * its webhook; the default callback just logs it.
    */
  def formatFailure(ctx: FailureContext): String =
    s"Task Failed! Task: `${ctx.task}` DAG: `${ctx.pipeline}` " +
      s"Attempts: ${ctx.attempts} Error: ${ctx.error.getMessage}"

  final case class Pipeline(
      name: String,
      tasks: Seq[Task],
      retry: RetryPolicy = RetryPolicy(),
      schedule: Option[String] = None, // cron metadata, e.g. "@daily"
      onFailure: FailureContext => Unit = ctx =>
        System.err.println(s"[pipeline] ${formatFailure(ctx)}")) {

    require(tasks.map(_.name).distinct.size == tasks.size,
      s"pipeline $name: duplicate task names")
    private val byName = tasks.map(t => t.name -> t).toMap
    tasks.foreach(t => t.deps.foreach(d => require(byName.contains(d),
      s"pipeline $name: task ${t.name} depends on unknown task $d")))

    /** Deterministic topological order: repeatedly take the first declared
      * task whose deps are all emitted (declaration order breaks ties, so
      * `export >> [postgres, s3] >> cleanup` runs the writers in the order
      * they were declared). Cycles are rejected.
      */
    private[pipeline] def topoOrder: Seq[Task] = {
      val emitted = scala.collection.mutable.LinkedHashSet.empty[String]
      val remaining = scala.collection.mutable.ArrayBuffer(tasks: _*)
      while (remaining.nonEmpty) {
        val i = remaining.indexWhere(_.deps.forall(emitted.contains))
        require(i >= 0,
          s"pipeline $name: dependency cycle among ${remaining.map(_.name).mkString(",")}")
        emitted += remaining.remove(i).name
      }
      emitted.toSeq.map(byName)
    }

    /** Execute the DAG: retry each task per policy; on terminal task
      * failure invoke `onFailure` and SKIP every transitive dependent
      * (cleanup never runs unless both writers succeeded); independent
      * branches still run.
      */
    def run(): RunReport = {
      val done = scala.collection.mutable.Map.empty[String, TaskResult]
      topoOrder.foreach { t =>
        val result =
          if (!t.deps.forall(d => done(d).status == Succeeded))
            TaskResult(t.name, Skipped, 0, None)
          else {
            var attempts = 0
            var lastErr: Option[Throwable] = None
            var ok = false
            while (!ok && attempts <= retry.retries) {
              if (attempts > 0 && retry.delayMs > 0) Thread.sleep(retry.delayMs)
              attempts += 1
              try { t.run(); ok = true; lastErr = None }
              catch { case scala.util.control.NonFatal(e) => lastErr = Some(e) }
            }
            if (ok) TaskResult(t.name, Succeeded, attempts, None)
            else {
              val ctx = FailureContext(name, t.name, attempts, lastErr.get)
              try onFailure(ctx)
              catch { case scala.util.control.NonFatal(e) =>
                System.err.println(s"[pipeline] failure callback threw: $e") }
              TaskResult(t.name, Failed, attempts, lastErr)
            }
          }
        done(t.name) = result
      }
      RunReport(name, tasks.map(t => done(t.name)))
    }
  }

  /** The mongo_to_storage DAG graph re-expressed over this engine's sinks
    * (mongo_to_storage.py:144-146): export the mood frame, fan out to the
    * warehouse + object-store writers, clean up ONLY after both succeed.
    */
  def moodExportDag(
      name: String,
      exportTask: () => Unit,
      loadWarehouse: () => Unit,
      uploadStore: () => Unit,
      cleanup: () => Unit,
      retry: RetryPolicy = RetryPolicy(),
      onFailure: FailureContext => Unit = ctx =>
        System.err.println(s"[pipeline] ${formatFailure(ctx)}")): Pipeline =
    Pipeline(name, Seq(
      Task("export_to_file")(exportTask),
      Task("load_to_warehouse", deps = Seq("export_to_file"))(loadWarehouse),
      Task("upload_to_store", deps = Seq("export_to_file"))(uploadStore),
      Task("cleanup", deps = Seq("load_to_warehouse", "upload_to_store"))(cleanup)),
      retry, Some("@daily"), onFailure)
}
