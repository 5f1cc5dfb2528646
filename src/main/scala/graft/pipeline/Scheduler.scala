package graft.pipeline

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import graft.pipeline.PipelineRunner.{Pipeline, RunReport}

/** Schedule evaluation for [[PipelineRunner]] pipelines — the thin clock
  * the reference delegates to Airflow's scheduler daemon:
  * `schedule_interval="0 1 * * *"` (daily_summary_report.py:57),
  * `"@daily"` (mongo_to_storage.py:118, mood_quality_check.py:51), and
  * cross-DAG firing via `TriggerDagRunOperator`
  * (mood_quality_check.py:68-73).
  *
  * Deliberately driven by an INJECTED clock: [[Loop.advance]] is handed
  * `(from, to]` and fires each pipeline once per cron boundary inside the
  * window. Nothing here sleeps or reads wall time — a deployment's outer
  * loop (cron, k8s, a while-sleep daemon) owns real time and calls
  * `advance(lastTick, now)`; tests tick a fake clock. That keeps every
  * schedule decision deterministic and replayable, and means a missed
  * wall-clock window (driver GC pause, restart) fires CATCH-UP runs on the
  * next tick instead of silently skipping them — the at-least-once
  * semantics a daily warehouse export actually wants (the runs themselves
  * are idempotent sinks; see UpsertSink).
  */
object Scheduler {

  /** A parsed 5-field cron expression. `domStar`/`dowStar` record whether
    * the day-of-month / day-of-week fields were `*` — standard cron
    * semantics OR the two day fields together when BOTH are restricted.
    */
  final case class Cron(
      minutes: Set[Int], hours: Set[Int], dom: Set[Int], months: Set[Int],
      dow: Set[Int], domStar: Boolean, dowStar: Boolean) {

    def matches(t: LocalDateTime): Boolean =
      minutes.contains(t.getMinute) && hours.contains(t.getHour) &&
        months.contains(t.getMonthValue) && dayMatches(t)

    /** First matching minute STRICTLY after `after`. Skips field-by-field
      * (wrong month → jump to next month, wrong day → next day, wrong
      * hour → next hour) so the search is O(fields traversed), not
      * O(minutes).
      *
      * Search bound = 401 years, which makes the search COMPLETE for
      * every cron [[isSatisfiable]] accepts: the Gregorian calendar
      * (dates AND weekdays) repeats exactly every 400 years, so if a
      * cron ever fires at some instant T it also fires at T + 400y —
      * hence any satisfiable cron fires within 400 years of ANY start.
      * The worst real gap is the rare-cron family like `0 0 29 2 1`
      * (Feb 29 falling on a Monday: gaps of 40+ years across century
      * non-leaps), which a shorter bound would wrongly reject AFTER
      * isSatisfiable accepted it at build time — poisoning every
      * advance() tick. The day-skip search keeps even the 400-year
      * worst case to ~16k iterations (29 Februaries' days + 11 month
      * jumps per year). The throw below is therefore reachable only
      * when nextFire is called directly on an unsatisfiable cron that
      * bypassed the Loop's build-time gate.
      */
    def nextFire(after: LocalDateTime): LocalDateTime = {
      var t = after.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val limit = after.plusYears(401)
      while (t.isBefore(limit)) {
        if (!months.contains(t.getMonthValue))
          t = t.withDayOfMonth(1).withHour(0).withMinute(0).plusMonths(1)
        else if (!dayMatches(t))
          t = t.withHour(0).withMinute(0).plusDays(1)
        else if (!hours.contains(t.getHour))
          t = t.withMinute(0).plusHours(1)
        else if (!minutes.contains(t.getMinute))
          t = t.plusMinutes(1)
        else return t
      }
      throw new IllegalArgumentException(
        s"cron expression never fires within 401 years after $after — " +
          "unsatisfiable (a satisfiable cron always fires within one " +
          "400-year Gregorian cycle)")
    }

    // Vixie day rule: the two day fields OR only when BOTH were
    // restricted (neither began with '*'); otherwise they AND — and each
    // field's SET always filters (a star-step field carries the star
    // FLAG but a restricted set; a literal '*' set is full, so the AND
    // is a no-op for it).
    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = dom.contains(t.getDayOfMonth)
      val dowOk = dow.contains(t.getDayOfWeek.getValue % 7)
      if (domStar || dowStar) domOk && dowOk else domOk || dowOk
    }

    /** Structural satisfiability — COMPLETE for this grammar, no date
      * search (a probe from any fixed epoch wrongly rejects satisfiable
      * rare crons, e.g. Feb 29 pinned to one weekday by a star-step dow
      * field, whose next fire can sit beyond any bounded search
      * window). Minute/hour/month sets are non-empty
      * by parsing, so the only way a parsed cron never fires is the day
      * clause: under the OR rule (both day fields restricted) dow alone
      * satisfies — every weekday recurs in every month — and under AND
      * semantics the dow requirement is also always eventually met (a
      * fixed (month, day) cycles through every weekday across years),
      * leaving exactly one failure mode: no month in the set has any
      * feasible day-of-month (`0 0 31 2 *`). February counts 29 — leap
      * years exist.
      */
    def isSatisfiable: Boolean = {
      def maxDom(m: Int): Int = m match {
        case 2 => 29
        case 4 | 6 | 9 | 11 => 30
        case _ => 31
      }
      if (!domStar && !dowStar) true
      else months.exists(m => dom.exists(_ <= maxDom(m)))
    }
  }

  /** Parse a cron schedule: the 5-field form (`min hour dom month dow`,
    * each field `*`, `N`, `A-B`, `A,B,C`, or `X/step` over any of those)
    * plus the Airflow-style aliases the reference uses. Day-of-week is
    * 0–7 with both 0 and 7 = Sunday (standard cron).
    */
  def parse(expr: String): Cron = expr.trim match {
    case "@hourly"  => parse("0 * * * *")
    case "@daily" | "@midnight" => parse("0 0 * * *")
    case "@weekly"  => parse("0 0 * * 0")
    case "@monthly" => parse("0 0 1 * *")
    case "@yearly" | "@annually" => parse("0 0 1 1 *")
    case s =>
      val fields = s.split("\\s+")
      require(fields.length == 5,
        s"cron '$expr': expected 5 fields, got ${fields.length}")
      val mins = parseField(fields(0), 0, 59)
      val hrs = parseField(fields(1), 0, 23)
      val dom = parseField(fields(2), 1, 31)
      val mon = parseField(fields(3), 1, 12)
      // map 7→0 so both spellings of Sunday compare equal
      val dow = parseField(fields(4), 0, 7).map(_ % 7)
      // vixie cron sets the day-field star flags for any field BEGINNING
      // with '*' (so `*/2` counts as star and the dom/dow OR rule stays
      // off): `0 0 15 * */2` fires only on 15ths that are also
      // even-numbered weekdays, not on every 15th
      Cron(mins, hrs, dom, mon, dow,
        domStar = fields(2).startsWith("*"),
        dowStar = fields(4).startsWith("*"))
  }

  private def parseField(f: String, lo: Int, hi: Int): Set[Int] = {
    def range(part: String): Seq[Int] = {
      val (base, step) = part.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field part '$part'")
      }
      require(step >= 1, s"cron step must be >= 1 in '$part'")
      val (from, to) = base match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-"); (a.toInt, b.toInt)
        case n if step > 1 => (n.toInt, hi) // "5/15" = every 15 from 5
        case n => val v = n.toInt; (v, v)
      }
      require(from >= lo && to <= hi && from <= to,
        s"cron field part '$part' out of range [$lo,$hi]")
      from.to(to, step)
    }
    f.split(",").flatMap(range).toSet
  }

  /** One schedulable unit: a pipeline, its cron, and the names of
    * pipelines to fire immediately when a scheduled run SUCCEEDS — the
    * `TriggerDagRunOperator` edge (mood_quality_check.py:68-73 fires the
    * export DAG only after the quality gate passes).
    */
  final case class Entry(
      pipeline: Pipeline,
      cron: Cron,
      triggersOnSuccess: Seq[String] = Nil)

  /** One fired run: which pipeline, the cron boundary that fired it (None
    * for a cross-DAG trigger), and the DAG's report.
    */
  final case class Fired(
      pipeline: String, at: Option[LocalDateTime], report: RunReport)

  /** The schedule loop. Hand it every scheduled pipeline; pipelines with
    * `schedule=None` in the reference simply aren't entries (they run via
    * triggers or manual [[PipelineRunner.Pipeline.run]]).
    */
  final class Loop(entries: Seq[Entry]) {
    require(entries.map(_.pipeline.name).distinct.size == entries.size,
      "duplicate pipeline names in schedule loop")
    private val byName = entries.map(e => e.pipeline.name -> e).toMap
    entries.foreach(e => e.triggersOnSuccess.foreach(t =>
      require(byName.contains(t),
        s"${e.pipeline.name} triggers unknown pipeline '$t'")))
    // fail at BUILD time on a parseable-but-unsatisfiable cron (e.g.
    // `0 0 31 2 *`): advance() evaluates every entry's nextFire each
    // tick, so one such entry would otherwise poison every tick for
    // every pipeline in the loop. The check is STRUCTURAL (Cron.
    // isSatisfiable) — a date-search probe from a fixed epoch would
    // wrongly reject satisfiable rare schedules.
    entries.foreach(e => require(e.cron.isSatisfiable,
      s"${e.pipeline.name}: unsatisfiable cron schedule " +
        "(no month in the expression has a feasible day-of-month)"))

    /** Fire every pipeline once per cron boundary in `(from, to]`, in
      * boundary order (ties broken by entry declaration order), running
      * cross-DAG triggers immediately after each successful scheduled
      * run. Triggers CASCADE: a triggered pipeline that succeeds fires
      * its own `triggersOnSuccess` in turn (Airflow's
      * TriggerDagRunOperator runs the triggered DAG's full graph,
      * further triggers included); a name already fired on the current
      * chain is skipped, so trigger cycles terminate. Returns every run
      * that fired, in execution order.
      */
    def advance(from: LocalDateTime, to: LocalDateTime): Seq[Fired] = {
      require(!to.isBefore(from), s"advance: to=$to precedes from=$from")
      val boundaries = for {
        (e, i) <- entries.zipWithIndex
        t <- Iterator.iterate(e.cron.nextFire(from))(e.cron.nextFire(_))
          .takeWhile(!_.isAfter(to)).toSeq
      } yield (t, i, e)
      boundaries.sortBy { case (t, i, _) => (t, i) }.flatMap { case (t, _, e) =>
        val report = e.pipeline.run()
        val triggered =
          if (report.succeeded) fireTriggers(e, Set(e.pipeline.name))
          else Nil
        Fired(e.pipeline.name, Some(t), report) +: triggered
      }
    }

    /** Depth-first cascade of `e.triggersOnSuccess`: run each triggered
      * pipeline, then (on success) its own triggers, guarding against
      * cycles with the per-chain `visited` set. A diamond (A triggers B
      * and C, both trigger D) runs D once per incoming edge — the same
      * behavior two TriggerDagRunOperators produce in Airflow.
      */
    private def fireTriggers(e: Entry, visited: Set[String]): Seq[Fired] =
      e.triggersOnSuccess.filterNot(visited).flatMap { n =>
        val ent = byName(n)
        val report = ent.pipeline.run()
        val chained =
          if (report.succeeded) fireTriggers(ent, visited + n)
          else Nil
        Fired(n, None, report) +: chained
      }
  }
}
