package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spatial

/** Grid-blocked within-radius join: complete recall vs brute force,
  * boundary exactness, cross-cell pairs, negative coordinates.
  */
class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def joinPairs(pts: Seq[(Long, Long, Long)],
                        r: Long): Set[(Long, Long, Long)] = {
    val df = pts.toDF("id", "x", "y")
    Spatial.withinRadiusJoin(df, "id", df, "id", "x", "y", r)
      .filter(org.apache.spark.sql.functions.col("l_id") <
        org.apache.spark.sql.functions.col("r_id"))
      .collect().map(c => (c.getLong(0), c.getLong(1), c.getLong(2))).toSet
  }

  private def brute(pts: Seq[(Long, Long, Long)],
                    r: Long): Set[(Long, Long, Long)] =
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet

  test("exactly-at-radius pairs are kept; one-past are dropped") {
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 0L, 11L), (4L, 6L, 8L))
    val out = joinPairs(pts, 10)
    assert(out.contains((1L, 2L, 100L))) // dist = r exactly
    assert(out.contains((1L, 4L, 100L))) // 6-8-10 triangle
    assert(!out.exists(p => p._1 == 1 && p._2 == 3)) // dist 11 > 10
  }

  test("pairs spanning cell boundaries are found (complete recall)") {
    // r=10 cells: (9,9) and (11,11) sit in different cells, dist^2=8;
    // (3,3) and (-1,-1) straddle the origin's cell corner, dist^2=32
    val pts = Seq((1L, 9L, 9L), (2L, 11L, 11L), (3L, -1L, -1L),
      (4L, 3L, 3L))
    val out = joinPairs(pts, 10)
    assert(out.contains((1L, 2L, 8L)))
    assert(out.contains((3L, 4L, 32L)))
    assert(!out.exists(p => p._1 == 2 && p._2 == 3)) // dist^2 288 > 100
  }

  test("matches brute force on random clouds, including negatives") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(400).toLong - 200, rnd.nextInt(400).toLong - 200))
    assert(joinPairs(pts, 25) == brute(pts, 25))
    assert(joinPairs(pts, 7) == brute(pts, 7))
  }
}
