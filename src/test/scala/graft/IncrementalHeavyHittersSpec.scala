package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalHeavyHitters, Sketches}
import graft.storage.VersionedTable

/** Incremental top-k-by-frequency: CMS linearity across deltas, mergeable
  * candidate summaries, delete-triggered rebuild, exactly-once offsets.
  */
class IncrementalHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshDirs() = {
    val r = java.nio.file.Files.createTempDirectory("inc_hh_").toString
    (s"$r/src", s"$r/state")
  }

  // zipf-ish values: "h0".."h4" heavy (400-i*50 copies), tail singletons
  private def batch(tag: Int, heavyOf: Int => Int) =
    (0 until 5).flatMap(i => Seq.fill(heavyOf(i))(s"h$i")) ++
      (0 until 300).map(i => s"tail_${tag}_$i")

  test("two delta refreshes equal the one-shot batch answer; delta-only") {
    val (srcDir, stDir) = freshDirs()
    val src = VersionedTable(spark, srcDir)
    val hh = IncrementalHeavyHitters(spark, src, stDir, "v", capacity = 256)

    src.append(batch(1, i => 400 - i * 50).toDF("v"))
    val (n1, r1) = hh.refresh()
    assert(n1 == 1 && !r1)
    src.append(batch(2, i => 100 + i * 10).toDF("v"))
    val (n2, r2) = hh.refresh()
    assert(n2 == 1 && !r2)

    val got = hh.topK(5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Sketches.heavyHitters(src.read.select(col("v").as("_v")),
        "_v", k = 5, capacity = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // same seed + same dims + CMS linearity: estimates match exactly
    assert(got == want, s"$got vs $want")
    // heavy keys got both batches' mass (estimate >= true count)
    val byItem = got.toMap
    assert(byItem("h0") >= 500L && byItem("h4") >= 340L)
  }

  test("a DELETE window triggers one announced full rebuild, result stays right") {
    val (srcDir, stDir) = freshDirs()
    val src = VersionedTable(spark, srcDir)
    val hh = IncrementalHeavyHitters(spark, src, stDir, "v", capacity = 128)
    src.append((Seq.fill(200)("keep") ++ Seq.fill(300)("gone") ++
      (0 until 100).map(i => s"t$i")).toDF("v"))
    hh.refresh()
    assert(hh.topK(1).head.getString(0) == "gone")
    src.deleteWhere(col("v") === "gone")
    val (_, rebuilt) = hh.refresh()
    assert(rebuilt, "DELETE window must announce a full rebuild")
    val top = hh.topK(1).head
    assert(top.getString(0) == "keep" && top.getLong(1) >= 200L)
  }

  test("refresh is a no-op when current; state survives reopening") {
    val (srcDir, stDir) = freshDirs()
    val src = VersionedTable(spark, srcDir)
    val hh = IncrementalHeavyHitters(spark, src, stDir, "v")
    src.append(Seq.fill(50)("x").toDF("v"))
    assert(hh.refresh() == (1L, false))
    assert(hh.refresh() == (0L, false))
    // a NEW instance over the same dirs sees the committed state + offset
    val hh2 = IncrementalHeavyHitters(spark, src, stDir, "v")
    assert(hh2.refresh() == (0L, false))
    assert(hh2.topK(1).head.getString(0) == "x")
  }
}
