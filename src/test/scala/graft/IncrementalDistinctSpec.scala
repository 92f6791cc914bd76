package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalDistinct
import graft.storage.VersionedTable

class IncrementalDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("inc_hll_").toString

  private def exact(src: VersionedTable): Map[String, Long] =
    src.read.groupBy("lang").agg(countDistinct(col("uid")).as("d"))
      .as[(String, Long)].collect().toMap

  private def est(inc: IncrementalDistinct): Map[String, Long] =
    inc.estimates.as[(String, Long)].collect().toMap

  private def assertClose(inc: IncrementalDistinct, src: VersionedTable): Unit = {
    val want = exact(src)
    val got = est(inc)
    assert(got.keySet == want.keySet, s"groups $got vs $want")
    want.foreach { case (k, w) =>
      val g = got(k)
      assert(math.abs(g - w) <= math.max(1L, (w * 0.05).toLong),
        s"group $k: estimate $g vs exact $w drifts past 5%")
    }
  }

  test("append-only history refreshes delta-only and tracks exact within 5%") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    val inc = IncrementalDistinct(spark, src, s"$root/hll",
      groupCols = Seq("lang"), distinctCol = "uid")

    // batch 1: 600 distinct uids in en, 200 in de (with repeats)
    src.append((0 until 1200).map(i => ("en", (i % 600).toLong)).toDF("lang", "uid")
      .union((0 until 400).map(i => ("de", (i % 200).toLong)).toDF("lang", "uid")))
    assert(inc.refresh() == ((1L, false)))
    assertClose(inc, src)

    // batch 2 overlaps batch 1 half-way: union semantics, not sum
    src.append((300 until 900).map(i => ("en", i.toLong)).toDF("lang", "uid"))
    src.append((0 until 50).map(i => ("fr", i.toLong)).toDF("lang", "uid"))
    assert(inc.refresh() == ((2L, false)))
    assertClose(inc, src)

    // replay safety: refreshing with nothing new is a no-op
    assert(inc.refresh() == ((0L, false)))
    assertClose(inc, src)
  }

  test("a delta with deletes falls back to one full rebuild and stays right") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    val inc = IncrementalDistinct(spark, src, s"$root/hll",
      groupCols = Seq("lang"), distinctCol = "uid")

    src.append((0 until 500).map(i => ("en", i.toLong)).toDF("lang", "uid"))
    assert(inc.refresh() == ((1L, false)))

    // overwrite shrinks the table: changesBetween carries DELETE rows
    src.overwrite((0 until 100).map(i => ("en", i.toLong)).toDF("lang", "uid"))
    val (applied, full) = inc.refresh()
    assert(applied == 1L && full, s"expected full rebuild, got ($applied, $full)")
    assertClose(inc, src)

    // and the next append goes back to the delta path
    src.append((100 until 150).map(i => ("en", i.toLong)).toDF("lang", "uid"))
    assert(inc.refresh() == ((1L, false)))
    assertClose(inc, src)
  }

  test("sketch state is bounded: target stores one row per group") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    val inc = IncrementalDistinct(spark, src, s"$root/hll",
      groupCols = Seq("lang"), distinctCol = "uid")
    src.append((0 until 2000).map(i => (s"l${i % 3}", i.toLong)).toDF("lang", "uid"))
    src.append((0 until 2000).map(i => (s"l${i % 3}", (i + 500).toLong)).toDF("lang", "uid"))
    inc.refresh()
    assert(VersionedTable(spark, s"$root/hll").read.count() == 3)
    assertClose(inc, src)
  }
}
