package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** As-of join semantics: latest right row at-or-before each left time. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsof picks the latest right row at or before the left time") {
    val quotes = Seq(
      ("A", ts("2026-01-01 10:00:00"), 100.0),
      ("A", ts("2026-01-01 10:05:00"), 101.0),
      ("A", ts("2026-01-01 10:10:00"), 102.0),
      ("B", ts("2026-01-01 10:03:00"), 50.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2026-01-01 10:04:00"), 10),  // sees 100.0
      ("A", ts("2026-01-01 10:05:00"), 20),  // inclusive: sees 101.0
      ("A", ts("2026-01-01 10:30:00"), 30),  // sees 102.0
      ("B", ts("2026-01-01 10:00:00"), 40),  // before any quote: null
      ("C", ts("2026-01-01 10:00:00"), 50)   // no key match: null
    ).toDF("sym", "tts", "qty")

    val out = AsofJoin.leftAsof(trades, quotes, "sym", "sym", "tts", "qts")
      .orderBy("qty").collect()
    assert(out.length == 5)
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 101.0)
    assert(out(2).getDouble(3) == 102.0)
    assert(out(3).isNullAt(3) && out(4).isNullAt(3))
  }

  test("forward direction picks the earliest right row at or after the left time") {
    val quotes = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("B", 5L, 50.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 10L, 1), // inclusive: sees 100.0
      ("A", 11L, 2), // next at 20 -> 101.0
      ("A", 25L, 3), // nothing after: null
      ("B", 1L, 4)   // sees 50.0
    ).toDF("sym", "tt", "qty")
    val out = AsofJoin.leftAsof(trades, quotes, "sym", "sym", "tt", "qt",
      direction = "forward").orderBy("qty").collect()
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 101.0)
    assert(out(2).isNullAt(3))
    assert(out(3).getDouble(3) == 50.0)
  }

  test("tolerance nulls out matches farther than the window") {
    val quotes = Seq(("A", 10L, 100.0)).toDF("sym", "qt", "px")
    val trades = Seq(("A", 12L, 1), ("A", 100L, 2)).toDF("sym", "tt", "qty")
    val out = AsofJoin.leftAsof(trades, quotes, "sym", "sym", "tt", "qt",
      tolerance = Some(5L)).orderBy("qty").collect()
    assert(out(0).getDouble(3) == 100.0) // 2 units away, inside tolerance
    assert(out(1).isNullAt(3))           // 90 units away, outside
  }

  test("NULL times match nothing in either direction") {
    val quotes = Seq(("A", Some(10L), 100.0), ("A", None: Option[Long], 999.0))
      .toDF("sym", "qt", "px")
    val trades = Seq(("A", Some(5L), 1), ("A", None: Option[Long], 2))
      .toDF("sym", "tt", "qty")
    val fwd = AsofJoin.leftAsof(trades, quotes, "sym", "sym", "tt", "qt",
      direction = "forward").orderBy("qty").collect()
    assert(fwd(0).getDouble(3) == 100.0) // t=5 forward → qt=10
    assert(fwd(1).isNullAt(3))           // null left time: no match
    val bwd = AsofJoin.leftAsof(trades, quotes, "sym", "sym", "tt", "qt").orderBy("qty").collect()
    assert(bwd(0).isNullAt(3) && bwd(1).isNullAt(3)) // nothing at/before 5; null time
  }

  test("duplicate right (key,time) rows resolve deterministically") {
    val right = Seq(("A", 1L, 5.0), ("A", 1L, 9.0)).toDF("k", "t", "v")
    val left = Seq(("A", 2L)).toDF("k", "t")
    val out = AsofJoin.leftAsof(left, right, "k", "k", "t", "t").collect()
    assert(out.head.getDouble(2) == 9.0) // max-struct survivor
  }

  test("nearest: closest side wins, ties break backward, tolerance nulls") {
    val quotes = Seq(
      ("A", ts("2026-01-01 10:00:00"), 1.0),
      ("A", ts("2026-01-01 10:10:00"), 2.0),
      ("B", ts("2026-01-01 10:00:00"), 3.0),
      ("B", ts("2026-01-01 10:04:00"), 4.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2026-01-01 10:07:00"), 1),  // 7 vs 3 min -> forward 2.0
      ("A", ts("2026-01-01 10:05:00"), 2),  // tie 5 vs 5 -> backward 1.0
      ("A", ts("2026-01-01 10:01:00"), 3),  // 1 vs 9 -> backward 1.0
      ("B", ts("2026-01-01 10:30:00"), 4),  // only backward exists -> 4.0
      ("C", ts("2026-01-01 10:00:00"), 5)   // no key -> null
    ).toDF("sym", "tts", "qty")
    val out = AsofJoin.leftAsofNearest(trades, quotes, "sym", "sym",
      "tts", "qts").orderBy("qty").collect()
    assert(out(0).getDouble(3) == 2.0)
    assert(out(1).getDouble(3) == 1.0)
    assert(out(2).getDouble(3) == 1.0)
    assert(out(3).getDouble(3) == 4.0)
    assert(out(4).isNullAt(3))
    // tolerance: 120s window nulls the 26-min-away match
    val tout = AsofJoin.leftAsofNearest(trades, quotes, "sym", "sym",
      "tts", "qts", tolerance = Some(120L)).orderBy("qty").collect()
    assert(tout(3).isNullAt(3))
    assert(tout(2).getDouble(3) == 1.0) // 60s away survives
  }

  test("no theta-join blowup: union+window plan, no nested-loop join") {
    val right = Seq(("A", 1L, 5.0)).toDF("k", "t", "v")
    val left = Seq(("A", 2L)).toDF("k", "t")
    val plan = AsofJoin.leftAsof(left, right, "k", "k", "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // exactly: one exchange for the right-side (key,time) dedup, one for the
    // union window on the key — the left side shuffles once
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
    assert(plan.contains("Window"), plan)
  }
}
