package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalQuantiles
import graft.storage.VersionedTable

class IncrementalQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("incr_quant").toString

  /** Exact reference: smallest value with cumulative count >= ceil(q*n). */
  private def disc(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    sorted(math.ceil(q * sorted.size).toInt - 1)
  }

  private def got(iq: IncrementalQuantiles, qs: Seq[Double]): Map[(String, Double), Double] =
    iq.quantiles(qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  test("two-batch build matches the exact discrete quantile definition") {
    val root = tmp()
    val rows = (1 to 97).map(i => ("a", i.toDouble)) ++
      (1 to 41).map(i => ("b", (i * 3).toDouble))
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val iq = IncrementalQuantiles(spark, src, s"$root/state",
      Seq("g"), col("v"))
    val df = rows.toDF("g", "v")
    src.append(df.filter(col("v") <= 30))
    assert(iq.refresh() == 1L)
    src.append(df.filter(col("v") > 30))
    assert(iq.refresh() == 1L)
    assert(iq.refresh() == 0L)
    val qs = Seq(0.25, 0.5, 0.9, 0.99, 1.0)
    val m = got(iq, qs)
    for (q <- qs) {
      assert(m(("a", q)) == disc((1 to 97).map(_.toDouble), q), s"a q=$q")
      assert(m(("b", q)) == disc((1 to 41).map(i => (i * 3).toDouble), q), s"b q=$q")
    }
  }

  test("deletes subtract exactly; zero buckets vanish from the state") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val iq = IncrementalQuantiles(spark, src, s"$root/state",
      Seq("g"), col("v"))
    src.append((1 to 50).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id"))
    iq.refresh()
    src.deleteWhere(col("id") > 40L) // drop the top 10 values entirely
    assert(iq.refresh() == 1L)
    val m = got(iq, Seq(0.5, 1.0))
    assert(m(("a", 0.5)) == disc((1 to 40).map(_.toDouble), 0.5))
    assert(m(("a", 1.0)) == 40.0) // max shrank: deleted buckets truly gone
    assert(iq.histogram.filter(col("_v") > 40.0).count() == 0L)
  }

  test("duplicate values accumulate counts (histogram, not a set)") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val iq = IncrementalQuantiles(spark, src, s"$root/state",
      Seq("g"), col("v"))
    // 90 copies of 1.0, 10 copies of 2.0 → p90 = 1.0, p99 = 2.0
    src.append(((1 to 90).map(_ => ("a", 1.0)) ++ (1 to 10).map(_ => ("a", 2.0)))
      .toDF("g", "v"))
    iq.refresh()
    val m = got(iq, Seq(0.9, 0.99))
    assert(m(("a", 0.9)) == 1.0 && m(("a", 0.99)) == 2.0)
    assert(iq.histogram.count() == 2L) // two buckets, not 100 rows
  }

  test("bucketed continuous domain: floor(v*10)/10 state stays bounded") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val iq = IncrementalQuantiles(spark, src, s"$root/state",
      Seq("g"), floor(col("v") * 10) / 10)
    val vals = (1 to 1000).map(i => ("a", i / 1000.0))
    src.append(vals.toDF("g", "v"))
    iq.refresh()
    assert(iq.histogram.count() <= 11L) // ≤ 11 buckets for [0.001, 1.0]
    val m = got(iq, Seq(0.5))
    assert(m(("a", 0.5)) == 0.5) // bucket of the median
  }
}
