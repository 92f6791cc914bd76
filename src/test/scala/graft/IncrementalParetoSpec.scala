package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalPareto
import graft.storage.VersionedTable

/** Incremental skyline: absorption under appends, delete fallback,
  * replay idempotence, frontier-sized state.
  */
class IncrementalParetoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def fixture() = {
    val r = java.nio.file.Files.createTempDirectory("incp").toString
    val src = VersionedTable(spark, r + "/src")
    (src, IncrementalPareto(spark, src, r + "/front", "id", "x", "y"))
  }

  private def naive(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter(p => !pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))).toSet

  test("four random appends maintain the exact full-history skyline") {
    val (src, inc) = fixture()
    val rnd = new scala.util.Random(31)
    val all = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    all.grouped(100).foreach { batch =>
      src.append(batch.toDF("id", "x", "y"))
      val (applied, full) = inc.refresh()
      assert(applied == 1 && !full)
    }
    val got = inc.frontier.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive(all))
  }

  test("a delta that would shrink the frontier still absorbs correctly") {
    val (src, inc) = fixture()
    src.append(Seq((1L, 5L, 5L)).toDF("id", "x", "y"))
    inc.refresh()
    // (2) dominates (1): the old frontier point must fall
    src.append(Seq((2L, 9L, 9L)).toDF("id", "x", "y"))
    inc.refresh()
    assert(inc.frontier.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("a window with deletes triggers one full rebuild, still exact") {
    val (src, inc) = fixture()
    src.append(Seq((1L, 9L, 1L), (2L, 1L, 9L), (3L, 9L, 9L))
      .toDF("id", "x", "y"))
    val (_, full1) = inc.refresh()
    assert(!full1)
    assert(inc.frontier.count() == 1) // (3) dominates both
    // removing the dominator must RESURRECT (1) and (2)
    src.overwrite(Seq((1L, 9L, 1L), (2L, 1L, 9L)).toDF("id", "x", "y"))
    val (_, full2) = inc.refresh()
    assert(full2, "a delete window must fall back to a full rebuild")
    assert(inc.frontier.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("refresh with no new commits is a no-op") {
    val (src, inc) = fixture()
    src.append(Seq((1L, 2L, 3L)).toDF("id", "x", "y"))
    inc.refresh()
    val v = inc.appliedVersion
    assert(inc.refresh() == ((0L, false)))
    assert(inc.appliedVersion == v)
  }
}
