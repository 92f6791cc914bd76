package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.triangleCounts(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("K4 plus a tail: clique nodes lcc=1, path node lcc=0, pendant dropped") {
    // K4 on 1..4; 4-5-6 tail: 5 has degree 2 and no triangle, 6 is pendant
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val out = counts(k4 ++ Seq((4L, 5L), (5L, 6L)))
    (1L to 3L).foreach { n => assert(out(n) == ((3L, 3L, 1.0))) }
    assert(out(4L) == ((4L, 3L, 0.5))) // deg 4: 3 triangles of C(4,2)=6 wedges
    assert(out(5L) == ((2L, 0L, 0.0)))
    assert(!out.contains(6L)) // degree 1: lcc undefined, excluded
  }

  test("direction, duplicates and self-loops are ignored") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 2L))
    val out = counts(messy)
    assert(out == Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
  }

  test("star hub has zero triangles (and generates no wedge work)") {
    val star = (2L to 20L).map(i => (1L, i)) :+ ((2L, 3L))
    val out = counts(star)
    assert(out(1L)._2 == 1L) // hub participates in exactly the 1-2-3 triangle
    assert(out(2L) == ((2L, 1L, 1.0)) && out(3L) == ((2L, 1L, 1.0)))
    assert((4L to 20L).forall(!out.contains(_))) // degree-1 leaves excluded
  }

  test("random graphs match brute-force enumeration") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 30
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val adj = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
        .view.mapValues(_.toSet).toMap
      val expected = adj.map { case (v, nb) =>
        val tri = nb.toSeq.combinations(2)
          .count { case Seq(a, b) => adj(a).contains(b) }
        v -> ((nb.size.toLong, tri.toLong,
          if (nb.size < 2) 0.0 else 2.0 * tri / (nb.size * (nb.size - 1))))
      }.filter(_._2._1 >= 2)
      assert(counts(edges) == expected)
    }
  }
}
