package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineRunner._
import graft.pipeline.Scheduler
import graft.pipeline.Scheduler.{Entry, Loop}

/** Schedule evaluation against an injected clock — the reference's Airflow
  * scheduler seam: `0 1 * * *` (daily_summary_report.py:57), `@daily`
  * (mongo_to_storage.py:118), TriggerDagRunOperator chaining
  * (mood_quality_check.py:68-73). No wall time anywhere: every test hands
  * the loop explicit `(from, to]` windows.
  */
class SchedulerSpec extends AnyFunSuite {

  private def at(s: String) = LocalDateTime.parse(s)

  test("cron parse + nextFire: the reference's '0 1 * * *' fires daily at 01:00") {
    val c = Scheduler.parse("0 1 * * *")
    assert(c.nextFire(at("2026-08-14T00:30:00")) == at("2026-08-14T01:00:00"))
    // exactly on the boundary → strictly-after semantics: next day
    assert(c.nextFire(at("2026-08-14T01:00:00")) == at("2026-08-15T01:00:00"))
    assert(c.matches(at("2026-08-14T01:00:00")))
    assert(!c.matches(at("2026-08-14T01:01:00")))
  }

  test("aliases, lists, ranges, steps, dow") {
    assert(Scheduler.parse("@daily").nextFire(at("2026-08-14T23:59:00")) ==
      at("2026-08-15T00:00:00"))
    assert(Scheduler.parse("@hourly").nextFire(at("2026-08-14T10:05:00")) ==
      at("2026-08-14T11:00:00"))
    val every15 = Scheduler.parse("*/15 * * * *")
    assert(every15.nextFire(at("2026-08-14T10:16:00")) == at("2026-08-14T10:30:00"))
    val workdays9 = Scheduler.parse("0 9 * * 1-5")
    // 2026-08-14 is a Friday; next weekday 09:00 after Fri 10:00 is Monday
    assert(workdays9.nextFire(at("2026-08-14T10:00:00")) == at("2026-08-17T09:00:00"))
    // Sunday as 7 and as 0 are the same day
    val sun7 = Scheduler.parse("0 0 * * 7")
    val sun0 = Scheduler.parse("0 0 * * 0")
    assert(sun7.nextFire(at("2026-08-14T00:00:00")) ==
      sun0.nextFire(at("2026-08-14T00:00:00")))
    val listed = Scheduler.parse("5,35 8-10 * * *")
    assert(listed.nextFire(at("2026-08-14T08:36:00")) == at("2026-08-14T09:05:00"))
    // month jump: only January → skips to next year from February
    val jan = Scheduler.parse("0 0 1 1 *")
    assert(jan.nextFire(at("2026-02-01T00:00:00")) == at("2027-01-01T00:00:00"))
    // unsatisfiable date fails fast instead of spinning forever
    intercept[IllegalArgumentException] {
      Scheduler.parse("0 0 31 2 *").nextFire(at("2026-01-01T00:00:00"))
    }
    intercept[IllegalArgumentException] { Scheduler.parse("0 1 * *") }
  }

  test("standard cron dom/dow OR: both restricted → either may match") {
    val c = Scheduler.parse("0 0 13 * 5") // 13th OR Friday
    assert(c.matches(at("2026-08-13T00:00:00"))) // a Thursday, but the 13th
    assert(c.matches(at("2026-08-14T00:00:00"))) // a Friday, not the 13th
    assert(!c.matches(at("2026-08-15T00:00:00"))) // Saturday the 15th
  }

  test("loop fires once per boundary; no boundary, no fire; catch-up fires all missed") {
    var runs = 0
    val daily = Pipeline("daily_summary", Seq(Task("report")(() => runs += 1)))
    val loop = new Loop(Seq(Entry(daily, Scheduler.parse("0 1 * * *"))))
    // window crossing exactly one 01:00 boundary → one run
    val f1 = loop.advance(at("2026-08-14T00:00:00"), at("2026-08-14T02:00:00"))
    assert(runs == 1 && f1.map(_.pipeline) == Seq("daily_summary"))
    assert(f1.head.at.contains(at("2026-08-14T01:00:00")))
    // later window inside the same day → nothing fires
    assert(loop.advance(at("2026-08-14T02:00:00"), at("2026-08-14T23:00:00")).isEmpty)
    assert(runs == 1)
    // a 3-day outage → catch-up: all three missed boundaries fire
    val f3 = loop.advance(at("2026-08-14T02:00:00"), at("2026-08-17T02:00:00"))
    assert(runs == 4 && f3.size == 3)
    assert(f3.map(_.at.get) == Seq(
      at("2026-08-15T01:00:00"), at("2026-08-16T01:00:00"), at("2026-08-17T01:00:00")))
  }

  test("TriggerDagRun edge: quality gate success fires export; failure does not") {
    var qualityOk = false
    var exports = 0
    var failures = 0
    val export = Pipeline("mongo_to_storage", Seq(Task("export")(() => exports += 1)))
    val quality = Pipeline("mood_quality_check",
      Seq(Task("check")(() => if (!qualityOk) sys.error("quality gate failed"))),
      onFailure = _ => failures += 1)
    val loop = new Loop(Seq(
      Entry(quality, Scheduler.parse("@daily"), triggersOnSuccess = Seq("mongo_to_storage")),
      Entry(export, Scheduler.parse("0 12 31 12 *")))) // effectively never in-window
    // failing gate: scheduled run fires, callback fires, NO export trigger
    val f1 = loop.advance(at("2026-08-14T12:00:00"), at("2026-08-15T12:00:00"))
    assert(f1.size == 1 && !f1.head.report.succeeded && failures == 1 && exports == 0)
    // passing gate: trigger fires the export DAG immediately, marked as triggered
    qualityOk = true
    val f2 = loop.advance(at("2026-08-15T12:00:00"), at("2026-08-16T12:00:00"))
    assert(f2.map(_.pipeline) == Seq("mood_quality_check", "mongo_to_storage"))
    assert(f2(1).at.isEmpty && exports == 1) // triggered run carries no boundary
    // unknown trigger target rejected at construction
    intercept[IllegalArgumentException] {
      new Loop(Seq(Entry(quality, Scheduler.parse("@daily"),
        triggersOnSuccess = Seq("nope"))))
    }
  }

  test("vixie star semantics: a step day-field keeps the dom/dow AND rule") {
    // `0 0 15 * */2`: dow begins with '*' → star flag set, so the rule is
    // dom AND dow-set, not OR — fires only on 15ths that are also
    // Sun/Tue/Thu/Sat
    val c = Scheduler.parse("0 0 15 * */2")
    assert(c.matches(at("2026-08-15T00:00:00")))   // Saturday the 15th (6 ∈ {0,2,4,6})
    assert(!c.matches(at("2026-06-15T00:00:00")))  // Monday the 15th (1 ∉ set): OR rule would fire
    assert(!c.matches(at("2026-08-16T00:00:00")))  // Sunday the 16th: right dow, wrong dom
    // and a genuinely unrestricted '*' day still matches everything
    assert(Scheduler.parse("0 0 15 * *").matches(at("2026-06-15T00:00:00")))
  }

  test("unsatisfiable cron poisons nothing: Loop construction fails fast") {
    var runs = 0
    val ok = Pipeline("ok", Seq(Task("t")(() => runs += 1)))
    val bad = Pipeline("bad", Seq(Task("t")(() => ())))
    val ex = intercept[IllegalArgumentException] {
      new Loop(Seq(
        Entry(ok, Scheduler.parse("0 1 * * *")),
        Entry(bad, Scheduler.parse("0 0 31 2 *"))))
    }
    assert(ex.getMessage.contains("bad"))
    assert(runs == 0)
    // the check is structural, so a RARE but satisfiable cron (Feb 29
    // pinned to Sunday via a star-step dow — next fire 2032-02-29, past
    // any bounded date-search window) constructs fine
    new Loop(Seq(Entry(ok, Scheduler.parse("0 0 29 2 */7"))))
    assert(!Scheduler.parse("0 0 31 2 *").isSatisfiable)
    assert(Scheduler.parse("0 0 29 2 */7").isSatisfiable)
    assert(Scheduler.parse("0 0 30 2,4 *").isSatisfiable) // April 30th
    assert(!Scheduler.parse("0 0 31 2,4,6,9,11 *").isSatisfiable)
  }

  test("nextFire covers everything isSatisfiable accepts — rare crons fire, not throw") {
    // Feb 29 pinned to Sunday (star-step dow → AND semantics): the next
    // fire from 2026 sits in 2032, far beyond the old 5-year search
    // bound, which made every advance() tick throw on an entry the
    // build-time satisfiability gate had just accepted.
    val rare = Scheduler.parse("0 0 29 2 */7")
    val t1 = rare.nextFire(at("2026-01-01T00:00:00"))
    assert(t1 == at("2032-02-29T00:00:00"))
    assert(t1.getDayOfWeek.getValue % 7 == 0) // Sunday
    // the worst gap in this family crosses the 2100 century non-leap:
    // Feb-29 Sundays run 2060, 2088, then nothing until 2128 — a
    // 40-year stretch no 5-year (or 35-year) search bound survives.
    // (Note `0 0 29 2 1` would NOT express Feb-29-on-Monday: with both
    // day fields restricted cron ORs them — every Feb Monday fires.
    // Only the star-step dow form keeps AND semantics.)
    val t2 = rare.nextFire(at("2089-01-01T00:00:00"))
    assert(t2 == at("2128-02-29T00:00:00"))
    assert(t2.getDayOfWeek.getValue % 7 == 0)
    assert(rare.matches(t2))
    // and advance() over a window containing a rare boundary fires it
    var runs = 0
    val p = Pipeline("rare", Seq(Task("t")(() => runs += 1)))
    val loop = new Loop(Seq(Entry(p, rare)))
    val fired = loop.advance(at("2032-02-28T00:00:00"), at("2032-03-01T00:00:00"))
    assert(fired.map(_.pipeline) == Seq("rare") && runs == 1)
    // a window NOT containing the (distant) boundary is an empty tick,
    // not an exception — the tick-poisoning regression this guards
    assert(loop.advance(at("2026-01-01T00:00:00"), at("2026-12-31T00:00:00")).isEmpty)
  }

  test("cross-DAG triggers cascade with cycle guard") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def p(name: String, ok: Boolean = true) = Pipeline(name,
      Seq(Task("t")(() => { order += name; if (!ok) sys.error(s"$name failed") })))
    // chain a → b → c, with c pointing back at a (cycle)
    val loop = new Loop(Seq(
      Entry(p("a"), Scheduler.parse("@daily"), triggersOnSuccess = Seq("b")),
      Entry(p("b"), Scheduler.parse("0 12 31 12 *"), triggersOnSuccess = Seq("c")),
      Entry(p("c"), Scheduler.parse("0 12 31 12 *"), triggersOnSuccess = Seq("a"))))
    val fired = loop.advance(at("2026-08-14T12:00:00"), at("2026-08-15T12:00:00"))
    // a (scheduled) → b → c; c's back-edge to a is suppressed by the guard
    assert(fired.map(_.pipeline) == Seq("a", "b", "c"))
    assert(order.toSeq == Seq("a", "b", "c"))
    assert(fired.head.at.nonEmpty && fired.tail.forall(_.at.isEmpty))
    // a failing mid-chain pipeline stops the cascade below it
    order.clear()
    val loop2 = new Loop(Seq(
      Entry(p("a"), Scheduler.parse("@daily"), triggersOnSuccess = Seq("b2")),
      Entry(p("b2", ok = false), Scheduler.parse("0 12 31 12 *"),
        triggersOnSuccess = Seq("c2")),
      Entry(p("c2"), Scheduler.parse("0 12 31 12 *"))))
    val fired2 = loop2.advance(at("2026-08-14T12:00:00"), at("2026-08-15T12:00:00"))
    assert(fired2.map(_.pipeline) == Seq("a", "b2"))
    assert(!fired2(1).report.succeeded && order.toSeq == Seq("a", "b2"))
  }
}
