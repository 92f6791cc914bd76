package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{CronSchedule, IntervalSchedule, TaskSchedule}

/** The schedule grammar behind CREATE TASK / run_due — Snowflake's
  * `USING CRON <5 fields> <tz>` (orchestrate_tasks.sql.j2:28-31 via
  * config/dev.yml:17) and `<n> MINUTE`. The scheduler's single primitive
  * is latest-occurrence-at-or-before, so that is what gets pinned.
  */
class TaskScheduleSpec extends AnyFunSuite {

  private def cron(s: String): CronSchedule =
    TaskSchedule.parse(s).get.asInstanceOf[CronSchedule]
  private def latest(s: String, now: String): Option[String] =
    cron(s).latestAtOrBefore(Instant.parse(now)).map(_.toString)

  test("interval shape: '<n> MINUTE[S]', case-insensitive") {
    assert(TaskSchedule.parse("60 MINUTE").contains(IntervalSchedule(60)))
    assert(TaskSchedule.parse(" 5 minutes ").contains(IntervalSchedule(5)))
    val iv = IntervalSchedule(30)
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    assert(!iv.due(t0, t0.plusSeconds(29 * 60)))
    assert(iv.due(t0, t0.plusSeconds(30 * 60)))
  }

  test("AFTER edges and garbage are not schedules; bad cron fields throw") {
    assert(TaskSchedule.parse("AFTER CO2_RAW_DATA_TASK").isEmpty)
    assert(TaskSchedule.parse("").isEmpty)
    assert(TaskSchedule.parse("whenever").isEmpty)
    // malformed FIELDS inside a recognized cron shape must fail loudly
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 61 10 * * * UTC"))
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 0 25 * * * UTC"))
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 5-1 * * * * UTC"))
    intercept[Exception](TaskSchedule.parse("USING CRON 0 10 * * * Mars/Olympus"))
  }

  test("daily 10:00 UTC: latest occurrence at/before a tick") {
    val s = "USING CRON 0 10 * * * UTC"
    assert(latest(s, "2026-01-02T09:59:00Z").contains("2026-01-01T10:00:00Z"))
    assert(latest(s, "2026-01-02T10:00:00Z").contains("2026-01-02T10:00:00Z"))
    assert(latest(s, "2026-01-02T23:00:00Z").contains("2026-01-02T10:00:00Z"))
  }

  test("lists, ranges and steps") {
    // every 15 min during business hours Mon-Fri
    val s = "USING CRON */15 9-17 * * 1-5 UTC"
    // 2026-01-02 is a Friday
    assert(latest(s, "2026-01-02T09:16:00Z").contains("2026-01-02T09:15:00Z"))
    assert(latest(s, "2026-01-02T08:59:00Z") // before window: Thu 17:45
      .contains("2026-01-01T17:45:00Z"))
    // 2026-01-03/04 is a weekend: Saturday tick resolves to Friday 17:45
    assert(latest(s, "2026-01-03T12:00:00Z").contains("2026-01-02T17:45:00Z"))
    val lists = "USING CRON 5,35 0,12 1,15 * * UTC"
    assert(latest(lists, "2026-02-15T12:40:00Z")
      .contains("2026-02-15T12:35:00Z"))
    assert(latest(lists, "2026-02-14T12:40:00Z")
      .contains("2026-02-01T12:35:00Z"))
  }

  test("dom/dow cron union semantics: both restricted means EITHER matches") {
    // day 13 OR Friday; 2026-02-13 is a Friday, 2026-03-13 likewise,
    // 2026-02-20 is a Friday that is not the 13th, 2026-03-13+0 days…
    val s = "USING CRON 0 0 13 * 5 UTC"
    assert(latest(s, "2026-02-21T00:00:00Z") // Fri Feb 20 matched via dow
      .contains("2026-02-20T00:00:00Z"))
    assert(latest(s, "2026-02-14T00:00:00Z") // Fri Feb 13 (both)
      .contains("2026-02-13T00:00:00Z"))
    // dom-only restriction: dow must NOT filter
    val domOnly = "USING CRON 0 0 13 * * UTC"
    assert(latest(domOnly, "2026-02-21T00:00:00Z")
      .contains("2026-02-13T00:00:00Z"))
    // dow 7 normalizes to Sunday(0): 2026-02-15 is a Sunday
    val sun = "USING CRON 0 0 * * 7 UTC"
    assert(latest(sun, "2026-02-16T00:00:00Z")
      .contains("2026-02-15T00:00:00Z"))
  }

  test("timezone: the cron evaluates in its own zone, result is an instant") {
    // 08:00 America/New_York == 13:00 UTC in winter (EST, UTC-5)
    val s = "USING CRON 0 8 * * * America/New_York"
    assert(latest(s, "2026-01-15T12:59:00Z").contains("2026-01-14T13:00:00Z"))
    assert(latest(s, "2026-01-15T13:00:00Z").contains("2026-01-15T13:00:00Z"))
  }

  test("unsatisfiable spec yields None instead of looping") {
    assert(latest("USING CRON 0 0 30 2 * UTC", "2026-06-01T00:00:00Z").isEmpty)
  }

  test("DST: occurrences are wall-clock times, not startOfDay+duration") {
    // US spring-forward 2026-03-08: 02:00 EST jumps to 03:00 EDT.
    // '0 10' must mean 10:00 local = 14:00 UTC (EDT), not midnight+10h
    // = 11:00 wall = 15:00 UTC
    val s = "USING CRON 0 10 * * * America/New_York"
    assert(latest(s, "2026-03-08T20:00:00Z").contains("2026-03-08T14:00:00Z"))
    // fall-back 2026-11-01: 10:00 EST = 15:00 UTC (not an hour early)
    assert(latest(s, "2026-11-01T20:00:00Z").contains("2026-11-01T15:00:00Z"))
    // a time INSIDE the spring-forward gap resolves to a valid instant
    // (java.time shifts it forward by the gap) and never lands after now
    val gap = "USING CRON 30 2 * * * America/New_York"
    val got = latest(gap, "2026-03-08T12:00:00Z")
    assert(got.isDefined && !java.time.Instant.parse(got.get)
      .isAfter(java.time.Instant.parse("2026-03-08T12:00:00Z")))
  }

  test("raw out-of-range values are rejected BEFORE normalization") {
    // dow 8..13 must throw, not alias to (v % 7)
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 0 10 * * 8 UTC"))
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 0 10 * * 1-13 UTC"))
    // dow 7 is the one sanctioned alias for Sunday(0)
    assert(TaskSchedule.parse("USING CRON 0 10 * * 7 UTC").isDefined)
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 0 10 0 * * UTC")) // dom 0
    intercept[IllegalArgumentException](
      TaskSchedule.parse("USING CRON 0 10 32 * * UTC"))
  }

  test("'*/1' in dow counts as unrestricted for the dom/dow union rule") {
    // Vixie cron: dom 15 with dow '*/1' fires ONLY on the 15th (dow is
    // star-shaped so it does not union-in every day)
    val s = "USING CRON 0 10 15 * */1 UTC"
    assert(latest(s, "2026-02-20T12:00:00Z").contains("2026-02-15T10:00:00Z"))
    // but an explicit range '0-6' IS restricted: dom 15 OR any dow → daily
    val r = "USING CRON 0 10 15 * 0-6 UTC"
    assert(latest(r, "2026-02-20T12:00:00Z").contains("2026-02-20T10:00:00Z"))
  }

  test("'*/2' in dom still restricts: star flag picks AND-vs-OR, never skips the bitmap") {
    // every-other-day means odd days ({1,3,…,31}); the star PREFIX only
    // decides the dom/dow combination rule, it must not disable the set
    val s = "USING CRON 0 0 */2 * * UTC"
    assert(latest(s, "2026-01-04T12:00:00Z").contains("2026-01-03T00:00:00Z"))
    assert(latest(s, "2026-01-03T12:00:00Z").contains("2026-01-03T00:00:00Z"))
    // dom '*/2' AND dow restricted: both sets must hold (Vixie AND path)
    // 2026-01-05 is an odd-day Monday; 2026-01-12 is an even-day Monday
    val t = "USING CRON 0 0 */2 * 1 UTC"
    assert(latest(t, "2026-01-13T12:00:00Z").contains("2026-01-05T00:00:00Z"))
  }

  test("property: day-walk search equals brute-force minute scan (100 random specs)") {
    // the day-walk is an optimization; a minute-by-minute scan over a
    // bounded window is the trivially-correct spec. Seeded, reproducible.
    val rnd = new scala.util.Random(20260814L)
    def randField(lo: Int, hi: Int): String = rnd.nextInt(4) match {
      case 0 => "*"
      case 1 => (lo + rnd.nextInt(hi - lo + 1)).toString
      case 2 =>
        val a = lo + rnd.nextInt(hi - lo + 1)
        val b = a + rnd.nextInt(hi - a + 1)
        s"$a-$b"
      case _ => s"*/${1 + rnd.nextInt(7)}"
    }
    def matchesAt(c: CronSchedule, t: Instant): Boolean = {
      val z = t.atZone(java.time.ZoneId.of("UTC"))
      val domOk = c.dom.contains(z.getDayOfMonth)
      val dowOk = c.dow.contains(z.getDayOfWeek.getValue % 7)
      // Vixie: star flags pick AND-vs-OR, bitmaps are always consulted
      // (so '*/2' in dom restricts even though its star flag is set)
      c.minutes.contains(z.getMinute) && c.hours.contains(z.getHour) &&
        c.months.contains(z.getMonthValue) &&
        (if (c.domStar || c.dowStar) domOk && dowOk else domOk || dowOk)
    }
    val t0 = Instant.parse("2026-02-26T00:00:00Z") // window spans Feb->Mar
    (1 to 100).foreach { i =>
      val spec = s"USING CRON ${randField(0, 59)} ${randField(0, 23)} " +
        s"${randField(1, 28)} ${randField(1, 12)} ${randField(0, 6)} UTC"
      val c = cron(spec)
      val now = t0.plusSeconds(rnd.nextInt(5 * 24 * 60) * 60L)
      // brute force: newest matching minute in the trailing 400 days
      val brute = Iterator.iterate(now.truncatedTo(
          java.time.temporal.ChronoUnit.MINUTES))(_.minusSeconds(60))
        .take(400 * 24 * 60).find(matchesAt(c, _))
      val got = c.latestAtOrBefore(now)
      assert(got == brute || (brute.isEmpty && got.isDefined),
        s"[$i] $spec at $now: got $got want $brute")
      if (brute.isEmpty) // outside the brute window: just sanity-bound it
        got.foreach(g => assert(!g.isAfter(now)))
      // forward search agrees with its own backward search: the next
      // occurrence's latestAtOrBefore is itself
      c.earliestAtOrAfter(now).foreach { n =>
        assert(!n.isBefore(now) && matchesAt(c, n), s"[$i] $spec next $n")
        assert(c.latestAtOrBefore(n).contains(n), s"[$i] $spec roundtrip $n")
      }
    }
  }
}
