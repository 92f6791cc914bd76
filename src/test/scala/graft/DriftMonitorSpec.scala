package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DriftMonitor

class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def hist(rows: Seq[(String, Double, Long)]) =
    rows.toDF("g", "_v", "cnt")

  private def psiOf(base: Seq[(String, Double, Long)],
                    cur: Seq[(String, Double, Long)]): Map[String, (Double, Long, Long)] =
    DriftMonitor.psi(hist(base), hist(cur), Seq("g")).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap

  test("identical distributions have PSI exactly 0") {
    val h = Seq(("a", 1.0, 50L), ("a", 2.0, 30L), ("a", 3.0, 20L))
    val m = psiOf(h, h)
    assert(m("a") == ((0.0, 100L, 100L)))
  }

  test("scaled-up identical shape stays ~0; a hard shift crosses 0.25") {
    val base = Seq(("a", 1.0, 50L), ("a", 2.0, 50L))
    val scaled = Seq(("a", 1.0, 500L), ("a", 2.0, 500L))
    assert(math.abs(psiOf(base, scaled)("a")._1) < 0.01)
    val shifted = Seq(("a", 1.0, 95L), ("a", 2.0, 5L))
    assert(psiOf(base, shifted)("a")._1 > 0.25)
  }

  test("disjoint buckets and one-sided groups stay finite (smoothing)") {
    val base = Seq(("a", 1.0, 100L), ("b", 1.0, 10L))
    val cur = Seq(("a", 9.0, 100L))
    val m = psiOf(base, cur)
    assert(m("a")._1 > 0.25 && java.lang.Double.isFinite(m("a")._1))
    assert(m("b") == ((m("b")._1, 10L, 0L)) &&
      java.lang.Double.isFinite(m("b")._1))
  }

  test("PSI is antisymmetric-stable: psi(b,c) == psi(c,b)") {
    // (p-q)ln(p/q) is symmetric under p<->q, so swapping sides must give
    // the identical value — a property check on the union-B smoothing
    val base = Seq(("a", 1.0, 80L), ("a", 2.0, 20L))
    val cur = Seq(("a", 1.0, 30L), ("a", 3.0, 70L))
    assert(psiOf(base, cur)("a")._1 == psiOf(cur, base)("a")._1)
  }

  test("histogram() matches a plain groupBy count") {
    val df = Seq(("a", 12.3), ("a", 17.9), ("a", 23.4), ("b", 5.0))
      .toDF("g", "v")
    val h = DriftMonitor.histogram(df, Seq("g"),
      (floor(col("v") / 10) * 10).cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(h == Map(("a", 10.0) -> 2L, ("a", 20.0) -> 1L, ("b", 0.0) -> 1L))
  }

  test("q87 catalog query returns one finite row per event type") {
    val rows = Queries.q87DriftPsi(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(java.lang.Double.isFinite(r.getAs[Double]("psi_r")))
      assert(r.getAs[Long]("n_base") > 0 && r.getAs[Long]("n_cur") > 0)
      // halves of the same synthetic feed: same generator, so PSI is
      // bounded — but at sf0.001 each type has only ~100 rows across
      // ~30 buckets, and small-sample PSI inflates (its expectation
      // grows like B/n), so the bound here is sanity, not stability
      assert(r.getAs[Double]("psi_r") < 1.0, r.toString)
    }
  }
}
