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

  test("reconcile: order- and partitioning-independent; a changed value localizes") {
    import graft.operators.Diagnostics
    val rows = (0 until 1000).map(i => (i.toLong, s"v$i"))
    val a = rows.toDF("k", "v").repartition(7)
    val b = scala.util.Random.shuffle(rows).toDF("k", "v").repartition(3)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Diagnostics.reconcile(df, Seq("k"), Seq("k", "v"), buckets = 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    assert(fp(a) == fp(b)) // row order and partitioning are invisible
    // one corrupted VALUE: key-addressed buckets keep every count, and
    // exactly ONE bucket's checksum moves (the localization contract —
    // content-addressed buckets would smear it across two as count drift)
    val c = rows.map { case (k, v) => (k, if (k == 500L) "CORRUPT" else v) }
      .toDF("k", "v")
    val (fa, fc) = (fp(a), fp(c))
    assert(fa.keySet == fc.keySet)
    assert(fa.forall { case (bk, (n, _)) => fc(bk)._1 == n })
    assert(fa.count { case (bk, (_, cs)) => fc(bk)._2 != cs } == 1)
  }

  test("reconcile: separator keeps shifted column boundaries distinct") {
    import graft.operators.Diagnostics
    // ("ab","c") vs ("a","bc") concatenate identically WITHOUT the 0x1
    // separator — the fingerprints must differ
    val x = Seq(("ab", "c")).toDF("a", "b")
    val y = Seq(("a", "bc")).toDF("a", "b")
    def cs(df: org.apache.spark.sql.DataFrame) =
      Diagnostics.reconcile(df, Seq("a"), Seq("a", "b"), 1)
        .head().getLong(2)
    assert(cs(x) != cs(y))
  }
}
