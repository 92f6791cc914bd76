package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WebAnalytics

/** URL path-tree rollup and corpus-source divergence. */
class WebAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("pathTreeRollup: prefixes, counts, distinct children, leaves") {
    val urls = Seq("/a/x/1", "/a/x/2", "/a/y/1", "/b").toDF("p")
    val out = WebAnalytics.pathTreeRollup(urls, "p")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("/a") == ((1, 3L, 2L)))    // children x, y
    assert(out("/a/x") == ((2, 2L, 2L)))  // children 1, 2
    assert(out("/a/y") == ((2, 1L, 1L)))
    assert(out("/a/x/1") == ((3, 1L, 0L))) // leaf: no children
    assert(out("/b") == ((1, 1L, 0L)))
    // maxDepth truncates the explode, non-path rows drop
    val deep = Seq("/1/2/3/4", "nope", null).toDF("p")
    val d2 = WebAnalytics.pathTreeRollup(deep, "p", maxDepth = 2)
    assert(d2.count() == 2 &&
      d2.agg(max("depth")).head().getInt(0) == 2)
  }

  test("corpusDivergence: identical sources diverge zero; disjoint diverge most") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"), // identical distributions
      ("c", "z z z")).toDF("src", "text")
    val out = WebAnalytics.corpusDivergence(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("kl")).toMap
    assert(out(("a", "b")) == 0.0 && out(("b", "a")) == 0.0)
    assert(out(("a", "c")) > 0.0 && out(("c", "a")) > 0.0)
    // KL is asymmetric in general but both directions exceed the
    // identical-pair baseline
    assert(out(("a", "c")) > out(("a", "b")))
  }

  test("corpusDivergence: smoothing keeps KL finite on disjoint vocabularies") {
    val docs = Seq(("a", "only left words"), ("b", "right side tokens"))
      .toDF("src", "text")
    val kl = WebAnalytics.corpusDivergence(docs, "src", "text")
      .agg(max(col("kl"))).head().getDouble(0)
    assert(!kl.isNaN && !kl.isInfinite && kl > 0)
  }
}
