package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Hits, Outliers, Timeseries}
import graft.plans.expressions.charEntropyStats

class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- Hits -------------------------------------------------------------

  test("HITS: one round on a known bipartite graph is exact by hand") {
    // h1 -> {a1, a2}, h2 -> {a2}. hub0 = 1e6 each.
    // auth_raw: a1 = 1e6, a2 = 2e6; max = 2e6 -> a1 = 500000, a2 = 1000000
    // hub_raw:  h1 = 1500000, h2 = 1000000; max -> h1 = 1e6, h2 = 666666
    val e = Seq((1L, 10L), (1L, 20L), (2L, 20L)).toDF("src", "dst")
    val out = Hits.scaledHits(e, iters = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (10L, "auth") -> 500000L, (20L, "auth") -> 1000000L,
      (1L, "hub") -> 1000000L, (2L, "hub") -> 666666L))
  }

  test("HITS: duplicate edges collapse; max score is exactly `scale`") {
    val e = Seq((1L, 10L), (1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val out = Hits.scaledHits(e, iters = 2)
    val byKind = out.groupBy("kind").agg(max("score")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind == Map("auth" -> 1000000L, "hub" -> 1000000L))
    // dup (1,10) must not double-count: authority of 10 beats 11
    val auth = out.filter(col("kind") === "auth")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(auth(10L) > auth(11L))
  }

  test("HITS: empty edges and out-of-range params fail loud") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Hits.scaledHits(Seq((1L, 2L)).toDF("src", "dst"), iters = 0)
    }
    intercept[IllegalArgumentException] { Hits.scaledHits(e, iters = 1).count() }
  }

  // ---- Outliers ---------------------------------------------------------

  test("MAD outliers: hand-computed medians and counts; null values drop") {
    // group a: values 1,2,3,4,100 -> med 3, devs 2,1,0,1,97 -> mad 1
    //   outliers (|x-3| > 3*1): 100 only -> 1
    // group b: 10,10,10 -> med 10, mad 0 -> any deviation is an outlier; none
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(100.0)), ("a", None),
      ("b", Some(10.0)), ("b", Some(10.0)), ("b", Some(10.0)))
      .toDF("g", "v")
    val out = Outliers.madOutliers(df, Seq("g"), "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("a") == ((5L, 3.0, 1.0, 1L)))
    assert(out("b") == ((3L, 10.0, 0.0, 0L)))
  }

  test("MAD outliers: even-count group uses interpolated exact median") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0)).toDF("g", "v")
    val r = Outliers.madOutliers(df, Seq("g"), "v").collect().head
    assert(r.getDouble(2) == 2.5) // (2+3)/2
    // devs: 1.5, 0.5, 0.5, 7.5 -> sorted 0.5 0.5 1.5 7.5 -> mad = 1.0
    assert(r.getDouble(3) == 1.0)
  }

  // ---- Timeseries.interpolateLinear --------------------------------------

  test("interpolation: interior gap is the straight line; edges clamp") {
    // series s: x=0 v=10, x=1 null, x=2 null, x=3 v=40 -> 20, 30
    // leading null at x=-1 -> 10 (lead); trailing at x=4 -> 40 (trail)
    val df = Seq(("s", -1.0, None), ("s", 0.0, Some(10.0)),
      ("s", 1.0, None), ("s", 2.0, None), ("s", 3.0, Some(40.0)),
      ("s", 4.0, None)).toDF("id", "x", "v")
    val out = Timeseries.interpolateLinear(df, Seq("id"), "x", "v")
      .collect().map(r => r.getDouble(1) ->
        ((Option(r.get(3)).map(_.toString.toDouble), r.getString(4)))).toMap
    assert(out(-1.0) == ((Some(10.0), "lead")))
    assert(out(0.0) == ((Some(10.0), "obs")))
    assert(out(1.0) == ((Some(20.0), "interp")))
    assert(out(2.0) == ((Some(30.0), "interp")))
    assert(out(3.0) == ((Some(40.0), "obs")))
    assert(out(4.0) == ((Some(40.0), "trail")))
  }

  test("interpolation: all-null series stays null; series are independent") {
    val df = Seq(("e", 0.0, None), ("e", 1.0, None),
      ("f", 0.0, Some(5.0)), ("f", 2.0, None)).toDF("id", "x", "v")
    val out = Timeseries.interpolateLinear(df, Seq("id"), "x", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((Option(r.get(3)), r.getString(4)))).toMap
    assert(out(("e", 0.0)) == ((None, "empty")))
    assert(out(("e", 1.0)) == ((None, "empty")))
    assert(out(("f", 2.0))._2 == "trail")
  }

  test("interpolation: uneven x spacing weights by distance") {
    // x=0 v=0, x=10 v=100; gap at x=1 -> 10.0 (not midpoint)
    val df = Seq(("s", 0.0, Some(0.0)), ("s", 1.0, None),
      ("s", 10.0, Some(100.0))).toDF("id", "x", "v")
    val got = Timeseries.interpolateLinear(df, Seq("id"), "x", "v")
      .filter(col("x") === 1.0).collect().head.getDouble(3)
    assert(got == 10.0)
  }

  // ---- CharEntropyStats kernel -------------------------------------------

  test("char entropy: uniform, degenerate, and surrogate-pair cases") {
    val df = Seq(("u", "abcd"), ("one", "aaaa"), ("emoji", "😀a"),
      ("empty", "")).toDF("id", "s")
    val out = df.select(col("id"), charEntropyStats(col("s")).as("st"))
      .select(col("id"), col("st.n_cp"), col("st.n_distinct"),
        col("st.entropy"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out("u")._1 == 4 && out("u")._2 == 4)
    assert(math.abs(out("u")._3 - math.log(4.0)) < 1e-12)
    assert(out("one") == ((4, 1, 0.0)))
    // surrogate pair counts as ONE code point
    assert(out("emoji")._1 == 2 && out("emoji")._2 == 2)
    assert(out("empty") == ((0, 0, 0.0)))
  }

  test("char entropy: kernel matches the declarative explode formulation") {
    val docs = Seq("the quick brown fox", "aabbccdd", "x",
      "mixed 123 ééé content").toDF("s")
    val kernel = docs.select(col("s"),
        charEntropyStats(col("s")).as("st"))
      .select(col("s"), col("st.n_cp"), col("st.n_distinct"),
        round(col("st.entropy"), 9).as("e"))
    val declarative = docs
      .select(col("s"), explode(split(col("s"), "")).as("ch"))
      .groupBy("s", "ch").count()
      .groupBy("s").agg(sum("count").cast("int").as("n_cp"),
        count(lit(1)).cast("int").as("n_distinct"),
        round(log(sum("count")) -
          sum(col("count") * log(col("count"))) / sum("count"), 9).as("e"))
    assert(kernel.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(kernel).isEmpty)
  }
}
