package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Diagnostics

/** Pre-flight shuffle diagnostics: skew report, heavy keys, exact join
  * cardinality without the join.
  */
class DiagnosticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("skewReport: counts, exact percentiles, skew ratio, ceil-div salt") {
    // key a: 6 rows, b: 2, c: 2 -> n=10, keys=3, max=6
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = Diagnostics.skewReport(df, Seq("k"), targetRowsPerKey = 4).head()
    assert(r.getAs[Long]("n_rows") == 10 && r.getAs[Long]("n_keys") == 3)
    assert(r.getAs[Long]("max_key_rows") == 6)
    assert(r.getAs[Double]("p50_key_rows") == 2.0)
    assert(r.getAs[Double]("skew_ratio") == 6.0 * 3 / 10)
    assert(r.getAs[Long]("suggested_salt") == 2) // ceil(6/4)
    // no skew: salt 1
    val flat = Seq("a", "b", "c").toDF("k")
    assert(Diagnostics.skewReport(flat, Seq("k"), 4)
      .head().getAs[Long]("suggested_salt") == 1)
  }

  test("topHeavyKeys returns the n largest keys in order") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val top = Diagnostics.topHeavyKeys(df, Seq("k"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq("a" -> 5L, "b" -> 3L))
  }

  test("joinCardinality equals the executed join's count (incl. NULL keys excluded)") {
    val l = Seq(Some(1), Some(1), Some(2), Some(3), None).toDF("k")
    val r = Seq(Some(1), Some(2), Some(2), None, None).toDF("k")
    val pre = Diagnostics.joinCardinality(l, r, Seq("k")).head()
    val real = l.join(r, Seq("k")).count()
    assert(pre.getAs[Long]("join_rows") == real && real == 4)
    assert(pre.getAs[Long]("n_matching_keys") == 2)
    assert(pre.getAs[Long]("max_key_contribution") == 2) // 1x2 or 2x1
  }

  test("self-join cardinality is the sigma-c-squared trap") {
    val df = (Seq.fill(4)("x") ++ Seq.fill(3)("y")).toDF("k")
    val pre = Diagnostics.joinCardinality(df, df, Seq("k")).head()
    assert(pre.getAs[Long]("join_rows") == 16 + 9)
    assert(pre.getAs[Long]("max_key_contribution") == 16)
  }

  test("deflateRatio: repetition compresses, null/empty -> null, range sane") {
    import graft.functions.TextFunctions
    val base = "the quick brown fox jumps over the lazy dog — " * 8
    val out = Seq(
      ("rep", base * 8), ("one", base), ("nul", null), ("emp", ""))
      .toDF("tag", "t")
      .select(col("tag"), TextFunctions.deflateRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("nul").isEmpty && out("emp").isEmpty)
    val (rep, one) = (out("rep").get, out("one").get)
    assert(rep > 0 && one > 0 && one < 1.0)
    assert(rep < one * 0.6, s"rep=$rep one=$one")
  }
}
