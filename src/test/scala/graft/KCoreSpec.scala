package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
                   maxRounds: Int = 30): Map[Long, Long] =
    KCore.kCore(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)

  test("K5 with a pendant tail: 4-core is exactly the clique") {
    val edges = k5 ++ Seq((5L, 6L), (6L, 7L))
    assert(core(edges, 4) == (1L to 5L).map(_ -> 4L).toMap)
    // 5-core of K5 is empty (max degree 4)
    assert(core(edges, 5).isEmpty)
  }

  test("peeling cascades: a chain hanging off the clique fully unravels at k=2") {
    // chain 5-6-7-8: every link has degree 2 until the END peels, then the
    // whole chain cascades over multiple rounds
    val edges = k5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val c2 = core(edges, 3)
    assert(c2.keySet == (1L to 5L).toSet)
    // triangle 6-7-8 bolted to the clique survives k=2 as part of the graph
    val withTri = k5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 6L))
    assert(core(withTri, 2).keySet == (1L to 8L).toSet)
  }

  test("maxRounds cap yields the bounded-round SUPERSET on a slow-peeling path") {
    // path 1-2-3-4-5-6, k=2: peels one layer per round from each end
    val path = (1L to 5L).map(i => (i, i + 1))
    assert(core(path, 2).isEmpty) // converged: no 2-core
    // after exactly 1 round only the two endpoints are gone
    assert(core(path, 2, maxRounds = 1).keySet == (2L to 5L).toSet)
  }

  test("direction, duplicates and self-loops are ignored") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(core(messy, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("driver and distributed peeling paths agree exactly") {
    // clique + cascading chain + triangle + isolated-ish pendant: exercises
    // multi-round peel, cap behaviour, and the d=0 output drop
    val edges = k5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 6L), (8L, 9L))
    import spark.implicits._
    def run(limit: Long, k: Int, rounds: Int) =
      KCore.kCore(edges.toDF("src", "dst"), k, rounds,
          driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- Seq(2, 3, 4); rounds <- Seq(1, 2, 30)) {
      assert(run(0L, k, rounds) == run(1000000L, k, rounds),
        s"paths disagree at k=$k maxRounds=$rounds")
    }
  }
}
