package graft.sql

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Parsed Snowflake-style task SCHEDULE — the two shapes `CREATE TASK`
  * accepts (reference: templates/orchestrate_tasks.sql.j2:28-31 uses
  * `SCHEDULE = 'USING CRON 0 10 * * * UTC'` from config/dev.yml:17):
  *
  *   - `'USING CRON <min> <hour> <dom> <month> <dow> <tz>'` — classic
  *     5-field cron evaluated in the named timezone. Fields accept `*`,
  *     numbers, `a-b` ranges, `a,b,c` lists and `* / n` / `a-b/n` steps;
  *     day-of-week is 0-6 with 0 = Sunday (7 normalizes to 0). Standard
  *     cron dom/dow union semantics: when BOTH fields are restricted a
  *     date matches if EITHER does.
  *   - `'<n> MINUTE[S]'` — fixed interval from the last fire.
  *
  * The scheduler asks one question: the latest occurrence at-or-before a
  * given instant ([[CronSchedule.latestAtOrBefore]]). Together with a
  * persisted per-task last-fire watermark that gives Snowflake's
  * catch-up-collapses-to-one semantics — an engine that was down over N
  * missed ticks runs the DAG ONCE at the next `run_due`, not N times.
  */
sealed trait TaskSchedule

final case class IntervalSchedule(minutes: Long) extends TaskSchedule {
  require(minutes > 0, s"interval must be positive, got $minutes")
  def due(lastFire: Instant, now: Instant): Boolean =
    !now.isBefore(lastFire.plus(minutes, ChronoUnit.MINUTES))
}

final case class CronSchedule(minutes: Set[Int], hours: Set[Int],
                              dom: Set[Int], months: Set[Int],
                              dow: Set[Int], domStar: Boolean,
                              dowStar: Boolean, zone: ZoneId)
    extends TaskSchedule {

  private def dateMatches(d: ZonedDateTime): Boolean = {
    if (!months.contains(d.getMonthValue)) return false
    val domOk = dom.contains(d.getDayOfMonth)
    // java.time: MONDAY=1..SUNDAY=7 — cron wants SUNDAY=0
    val dowOk = dow.contains(d.getDayOfWeek.getValue % 7)
    // Vixie cron: the star flags only select AND-vs-OR; the value sets
    // are ALWAYS consulted — '*/2' in dom keeps its star flag (AND with
    // dow) but still restricts to its own bitmap {1,3,…}
    if (domStar || dowStar) domOk && dowOk
    else domOk || dowOk // both restricted: classic cron OR
  }

  /** Most recent scheduled occurrence ≤ `now`, or None if no occurrence
    * exists in the trailing 5 years (an unsatisfiable spec like Feb 30).
    * Walks DAYS backward (≤ ~1 830 iterations worst case), then picks the
    * largest matching (hour, minute) on the matching day — never iterates
    * minute-by-minute.
    */
  def latestAtOrBefore(now: Instant): Option[Instant] = {
    val z = now.atZone(zone)
    var day = z.toLocalDate
    val floor = day.minusYears(5)
    while (!day.isBefore(floor)) {
      val d0 = day.atStartOfDay(zone)
      if (dateMatches(d0)) {
        // today: only times ≤ now qualify; earlier days: any time
        val sameDay = day == z.toLocalDate
        val hLimit = if (sameDay) z.getHour else 23
        val hCands = hours.filter(_ <= hLimit).toSeq.sorted.reverse
        hCands.foreach { h =>
          val mLimit = if (sameDay && h == z.getHour) z.getMinute else 59
          val mCands = minutes.filter(_ <= mLimit)
          if (mCands.nonEmpty) {
            // wall-clock resolution, not startOfDay+duration: java.time
            // resolves a DST gap/overlap to a valid wall time, so
            // '0 10 …' on a spring-forward day still means 10:00 local
            val t = day.atTime(h, mCands.max).atZone(zone)
            if (!t.toInstant.isAfter(now)) return Some(t.toInstant)
          }
        }
      }
      day = day.minusDays(1)
    }
    None
  }

  /** Earliest scheduled occurrence ≥ `now` (the SHOW TASKS "next fire"
    * column), or None within 5 years. Same day-walk as
    * [[latestAtOrBefore]], forward.
    */
  def earliestAtOrAfter(now: Instant): Option[Instant] = {
    val z = now.atZone(zone)
    var day = z.toLocalDate
    val ceilDay = day.plusYears(5)
    while (!day.isAfter(ceilDay)) {
      val d0 = day.atStartOfDay(zone)
      if (dateMatches(d0)) {
        val sameDay = day == z.toLocalDate
        val hFrom = if (sameDay) z.getHour else 0
        hours.filter(_ >= hFrom).toSeq.sorted.foreach { h =>
          val mFrom = if (sameDay && h == z.getHour) z.getMinute else 0
          val mC = minutes.filter(_ >= mFrom)
          if (mC.nonEmpty) {
            val t = day.atTime(h, mC.min).atZone(zone)
            if (!t.toInstant.isBefore(now)) return Some(t.toInstant)
          }
        }
      }
      day = day.plusDays(1)
    }
    None
  }
}

object TaskSchedule {
  private val IntervalRe = """(?i)\s*(\d+)\s+MINUTES?\s*""".r
  private val CronRe =
    """(?i)\s*USING\s+CRON\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s*""".r

  /** One cron field → value set over [lo, hi]; `normalize` folds aliases
    * (dow 7 → 0). Throws IllegalArgumentException on malformed input —
    * a bad SCHEDULE must fail at CREATE TASK, not silently never fire.
    * Raw values are range-checked BEFORE normalization (against
    * [lo, hi]), so dow '8'..'13' is rejected rather than silently
    * accepted as (v % 7); only the single alias 7→0 passes through.
    */
  private[sql] def parseField(f: String, lo: Int, hi: Int,
                              normalize: Int => Int = identity): Set[Int] = {
    def one(tok: String): Seq[Int] = {
      val (rangePart, step) = tok.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = s.toInt
          require(st > 0, s"cron step must be positive in '$tok'")
          (r, st)
        case _ => throw new IllegalArgumentException(s"bad cron token '$tok'")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-", 2); (x.toInt, y.toInt)
        case n =>
          val v = n.toInt
          // a bare value with a step ('3/5') means 'from 3 to max by 5'
          if (step > 1) (v, hi) else (v, v)
      }
      require(a <= b, s"inverted cron range '$tok'")
      require(a >= lo && b <= hi,
        s"cron token '$tok' out of range [$lo,$hi]")
      (a to b by step).map(normalize)
    }
    val vals = f.split(",").toSeq.flatMap(one).toSet
    require(vals.nonEmpty, s"cron field '$f' matches nothing")
    vals
  }

  /** Parses a SCHEDULE string; None for shapes that are not time
    * schedules (empty / `AFTER <task>` DAG edges).
    */
  def parse(schedule: String): Option[TaskSchedule] = schedule match {
    case IntervalRe(n) => Some(IntervalSchedule(n.toLong))
    case CronRe(mi, h, dm, mo, dw, tz) =>
      Some(CronSchedule(
        parseField(mi, 0, 59),
        parseField(h, 0, 23),
        parseField(dm, 1, 31),
        parseField(mo, 1, 12),
        parseField(dw, 0, 7, v => v % 7),
        // Vixie cron: the dom/dow union rule keys on whether the field
        // STARTS with '*' ('*' or '*/n' both count as unrestricted), not
        // on literal equality with "*"
        domStar = dm.startsWith("*"),
        dowStar = dw.startsWith("*"),
        ZoneId.of(tz)))
    case _ => None
  }
}
