package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FuzzyText, Sessions, Timeseries}

class SessionsFuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ---- Sessions -----------------------------------------------------------

  test("sessionize: boundary is strictly-greater-than the gap") {
    // u1: 10:00, 10:30 (same session at gap 1800 — diff == gap, NOT >),
    //     11:00:01 (diff 1801 > 1800 -> new session)
    val df = Seq((1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), (1L, ts("2024-01-01 11:00:01")))
      .toDF("u", "t")
    val out = Sessions.sessionize(df, Seq("u"), "t", 1800L)
      .orderBy("t").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 1L, 2L))
  }

  test("sessionStats: hand-computed sessions; users are independent") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 15:00:00")),
      (2L, ts("2024-01-01 10:05:00"))).toDF("u", "t")
    val out = Sessions.sessionStats(df, Seq("u"), "t", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(out((1L, 1L)) == ((2L, 600L))) // 2 events, 10 min span
    assert(out((1L, 2L)) == ((1L, 0L)))
    assert(out((2L, 1L)) == ((1L, 0L)))
    intercept[IllegalArgumentException](
      Sessions.sessionize(df, Seq.empty, "t", 10L))
    intercept[IllegalArgumentException](
      Sessions.sessionize(df, Seq("u"), "t", 0L))
  }

  // ---- FuzzyText.editJoin1 ------------------------------------------------

  test("editJoin1: insert, delete, substitute match; distance 2 does not") {
    val left = Seq((1L, "kitten"), (2L, "ab"), (3L, "hello")).toDF("id", "s")
    val right = Seq(
      (10L, "kitten"),   // dist 0
      (11L, "kittens"),  // insert -> 1
      (12L, "kiten"),    // delete -> 1
      (13L, "mitten"),   // substitute -> 1
      (14L, "ba"),       // shares del1 keys with "ab" but dist 2
      (15L, "hxllo"),    // substitute -> 1
      (16L, "world")).toDF("id", "s")
    val out = FuzzyText.editJoin1(left, "id", "s", right, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out == Map((1L, 10L) -> 0, (1L, 11L) -> 1, (1L, 12L) -> 1,
      (1L, 13L) -> 1, (3L, 15L) -> 1))
  }

  test("editJoin1: nulls and empties drop; candidate dedup yields one row") {
    val left = Seq((1L, "aa"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("id", "s")
    val right = Seq((10L, "aa")).toDF("id", "s")
    // "aa" and "aa" share 3 keys (identity + two identical deletions
    // deduped to one) — output must still be a single pair
    val rows = FuzzyText.editJoin1(left, "id", "s", right, "id", "s").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
  }

  test("editJoin1: maxBucket drops degenerate key buckets") {
    val left = (1L to 10L).map(i => (i, "dup")).toDF("id", "s")
    val right = Seq((100L, "dup")).toDF("id", "s")
    // every left row shares every key: bucket size 10 > cap 5 -> dropped
    assert(FuzzyText.editJoin1(left, "id", "s", right, "id", "s",
      maxBucket = 5).isEmpty)
    assert(FuzzyText.editJoin1(left, "id", "s", right, "id", "s")
      .count() == 10)
  }

  // ---- Timeseries.cusumChangePoint ---------------------------------------

  test("cusum: level shift is located at the step") {
    // series: 0,0,0,10,10,10 at x=1..6 -> mean 5; cusum -5,-10,-15,-10,-5,0
    // peak |cusum| = 15 at x=3
    val df = Seq(("a", 1, 0.0), ("a", 2, 0.0), ("a", 3, 0.0),
      ("a", 4, 10.0), ("a", 5, 10.0), ("a", 6, 10.0)).toDF("g", "x", "v")
    val r = Timeseries.cusumChangePoint(df, Seq("g"), "x", "v")
      .collect().head
    assert(r.getLong(1) == 6L && r.getDouble(2) == 5.0)
    assert(r.getInt(3) == 3 && r.getDouble(4) == 15.0)
  }

  test("cusum: constant series peaks at the first x with |cusum| = 0") {
    val df = Seq(("c", 5, 2.0), ("c", 7, 2.0)).toDF("g", "x", "v")
    val r = Timeseries.cusumChangePoint(df, Seq("g"), "x", "v")
      .collect().head
    assert(r.getInt(3) == 5 && r.getDouble(4) == 0.0)
    intercept[IllegalArgumentException](
      Timeseries.cusumChangePoint(df, Seq.empty, "x", "v"))
  }

  // ---- jaroWinkler -------------------------------------------------------

  private def jw(a: String, b: String): Double =
    graft.plans.ExprKernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaroWinkler: the textbook Winkler vectors") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
  }

  test("jaroWinkler: identity, disjoint, empties, boost threshold") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // jaro("ab", "ax") = (1/2 + 1/2 + 1)/3 = 2/3 exactly
    assert(math.abs(jw("ab", "ax") - 2.0 / 3.0) < 1e-12)
  }

  test("jwJoin: blocked candidates only, threshold applied, codegen path") {
    val left = Seq(("1", "martha"), ("2", "dwayne"), ("3", "zzz"))
      .toDF("id", "s")
    val right = Seq(("a", "marhta"), ("b", "duane"), ("c", "zzzzzzzzzzzz"))
      .toDF("id", "s")
    val out = FuzzyText.jwJoin(left, "id", "s", right, "id", "s",
        minSim = 0.8).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // zzz vs zzzzzzzzzzzz is outside the length band despite high JW
    assert(out == Set(("1", "a"), ("2", "b")))
  }
}
