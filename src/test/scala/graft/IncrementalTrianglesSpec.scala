package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalTriangles, Triangles}
import graft.storage.VersionedTable

/** Incremental triangles: delta-driven refreshes must equal the batch
  * [[Triangles.triangleCounts]] after every batch — including triangles
  * whose edges straddle batches (old-old-new, old-new-new, new-new-new,
  * each with a distinct credit path through the smallest-new-edge rule);
  * replays and re-appended edges must not double count; deletes refuse.
  */
class IncrementalTrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Double)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  private def batch(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    snap(Triangles.triangleCounts(edges.toDF("src", "dst")))

  test("cross-batch triangles count once per credit class") {
    val root = java.nio.file.Files.createTempDirectory("inc_tri").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val it = IncrementalTriangles(spark, src, s"$root/state")

    // batch 1: path 1-2-3 (no triangle yet) + standalone edge 10-11
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    src.append(b1.toDF("id_a", "id_b"))
    assert(it.refresh() == 1L)
    assert(snap(it.read) == batch(b1))
    assert(snap(it.read).values.forall(_._2 == 0L))

    // batch 2: one OLD-OLD-NEW triangle (closing 1-3), one OLD-NEW-NEW
    // (10-11 + new 11-12, 12-10), one NEW-NEW-NEW (20-21-22)
    val b2 = Seq((1L, 3L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 22L), (22L, 20L))
    src.append(b2.toDF("id_a", "id_b"))
    assert(it.refresh() == 1L)
    val s2 = snap(it.read)
    assert(s2 == batch(b1 ++ b2))
    assert(s2(1L)._2 == 1L && s2(10L)._2 == 1L && s2(20L)._2 == 1L)

    // batch 3: random overlay on a shared node range (many straddling
    // triangles) — equality with from-scratch is the real contract
    val rng = new scala.util.Random(11)
    val b3 = (1 to 120).map(_ =>
      (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    src.append(b3.toDF("id_a", "id_b"))
    assert(it.refresh() == 1L)
    assert(snap(it.read) == batch(b1 ++ b2 ++ b3))

    // already current; replay is a no-op
    assert(it.refresh() == 0L)

    // re-appending existing edges must not double count
    src.append(Seq((1L, 3L), (20L, 21L)).toDF("id_a", "id_b"))
    assert(it.refresh() == 1L)
    assert(snap(it.read) == batch(b1 ++ b2 ++ b3))
  }

  test("second random profile: repeated small batches stay exact") {
    val root = java.nio.file.Files.createTempDirectory("inc_tri2").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val it = IncrementalTriangles(spark, src, s"$root/state")
    val rng = new scala.util.Random(42)
    var all = Seq.empty[(Long, Long)]
    (1 to 4).foreach { _ =>
      val b = (1 to 40).map(_ =>
        (rng.nextInt(15).toLong, rng.nextInt(15).toLong))
      all = all ++ b
      src.append(b.toDF("id_a", "id_b"))
      assert(it.refresh() == 1L)
      assert(snap(it.read) == batch(all))
    }
  }

  test("DELETE rows in the source delta are refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("inc_tri3").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val it = IncrementalTriangles(spark, src, s"$root/state")
    src.append(Seq((1L, 2L)).toDF("id_a", "id_b"))
    assert(it.refresh() == 1L)
    src.deleteWhere(col("id_a") === 1L)
    val ex = intercept[IllegalArgumentException](it.refresh())
    assert(ex.getMessage.contains("append-only"))
  }
}
