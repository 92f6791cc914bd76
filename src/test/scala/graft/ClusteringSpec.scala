package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Grid-density clustering: dense/noise split, 8-adjacency merging,
  * negative coordinates, determinism.
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def cluster(pts: Seq[(Long, Long, Long)], cell: Long = 10,
                      minPts: Long = 3): Map[Long, Option[Long]] =
    Clustering.gridDensity(pts.toDF("id", "x", "y"), "id", "x", "y",
        cell, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("two separated blobs cluster apart; a lone point is noise") {
    val blobA = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L))
    val blobB = Seq((4L, 101L, 101L), (5L, 102L, 102L), (6L, 103L, 103L))
    val noise = Seq((7L, 55L, 55L))
    val out = cluster(blobA ++ blobB ++ noise)
    assert(out(7L).isEmpty)
    val ca = out(1L); val cb = out(4L)
    assert(ca.nonEmpty && cb.nonEmpty && ca != cb)
    assert(Seq(2L, 3L).forall(out(_) == ca))
    assert(Seq(5L, 6L).forall(out(_) == cb))
  }

  test("diagonally adjacent dense cells merge into one cluster") {
    // cell (0,0) and cell (1,1) each hold 3 points — 8-adjacency joins them
    val pts = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 11L, 11L), (5L, 12L, 12L), (6L, 13L, 13L))
    val out = cluster(pts)
    assert(out.values.flatten.toSet.size == 1)
    assert(out.values.forall(_.nonEmpty))
  }

  test("negative coordinates floor to the correct cells") {
    // x in [-10,-1) is cell -1; crossing 0 must not fuse cells wrongly
    val neg = Seq((1L, -9L, -9L), (2L, -8L, -8L), (3L, -7L, -7L))
    val far = Seq((4L, 40L, 40L), (5L, 41L, 41L), (6L, 42L, 42L))
    val out = cluster(neg ++ far)
    assert(out(1L).nonEmpty && out(4L).nonEmpty && out(1L) != out(4L))
  }

  test("minPts gates density; below-threshold cells are all noise") {
    val pts = Seq((1L, 1L, 1L), (2L, 2L, 2L))
    assert(cluster(pts, minPts = 3).values.forall(_.isEmpty))
    assert(cluster(pts, minPts = 2).values.forall(_.nonEmpty))
  }

  test("deterministic under repartition and reorder") {
    val rnd = new scala.util.Random(9)
    val pts = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(200).toLong - 100, rnd.nextInt(200).toLong - 100))
    val a = cluster(pts)
    val b = Clustering.gridDensity(
        pts.toDF("id", "x", "y").orderBy(rand(4)).repartition(13),
        "id", "x", "y", 10, 3)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(a == b)
  }
}
