package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graphs, PageRank, Stats}

class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val aaLn2 = math.floor(1e9 / math.log(2.0)).toLong // deg-2 term

  // ---- linkPredict --------------------------------------------------------

  test("linkPredict: path a-b-c predicts (a,c) with hand-computed scores") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graphs.linkPredict(e).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 3L)))
    assert(r.getAs[Long]("cn") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0) // 1 / (1 + 1 - 1)
    assert(r.getAs[Long]("aa_scaled") == aaLn2)
  }

  test("linkPredict: 4-cycle predicts both diagonals via two centers") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = Graphs.linkPredict(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("cn"), r.getAs[Double]("jaccard"),
          r.getAs[Long]("aa_scaled")))).toMap
    // (1,3) via 2 and 4; degrees all 2 -> jaccard 2/(2+2-2) = 1
    assert(out == Map(
      (1L, 3L) -> ((2L, 1.0, 2 * aaLn2)),
      (2L, 4L) -> ((2L, 1.0, 2 * aaLn2))))
  }

  test("linkPredict: triangle has no candidates (all pairs adjacent)") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graphs.linkPredict(e).count() == 0L)
  }

  test("linkPredict: hub centers beyond maxWedgeDegree are gated out") {
    // star center 0 with 4 leaves: every leaf pair is a candidate via 0
    val e = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    assert(Graphs.linkPredict(e).count() == 6L)
    assert(Graphs.linkPredict(e, maxWedgeDegree = 3).count() == 0L)
  }

  test("linkPredict: duplicate/reversed input edges do not double-count") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graphs.linkPredict(e).collect().head
    assert(r.getAs[Long]("cn") == 1L && r.getAs[Double]("jaccard") == 1.0)
  }

  // ---- labelPropagate -------------------------------------------------------

  test("labelPropagate: labels spread one hop per round; unreached stay null") {
    // path 1-2-3-4-5, seed 1 -> 7
    val dir = (1L to 4L).map(i => (i, i + 1))
    val e = dir.toDF("src", "dst")
    val seeds = Seq((1L, 7L)).toDF("id", "label")
    def labelled(iters: Int): Map[Long, Option[Long]] =
      Graphs.labelPropagate(e, seeds, iters).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val one = labelled(1)
    assert(one(2L).contains(7L) && one(3L).isEmpty)
    val two = labelled(2)
    assert(two(3L).contains(7L) && two(5L).isEmpty)
  }

  test("labelPropagate: majority wins; equal votes break to smallest label") {
    // center 0 sees labels {5 (x2), 9 (x1)} -> 5; center 10 sees {3, 8} tied -> 3
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 11L), (10L, 12L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 5L), (2L, 5L), (3L, 9L), (11L, 8L), (12L, 3L))
      .toDF("id", "label")
    val out = Graphs.labelPropagate(e, seeds, iters = 1).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(0L).contains(5L))
    assert(out(10L).contains(3L))
  }

  test("labelPropagate: seeds are clamped; duplicate seeds keep min label") {
    // 1 (seed 9) - 2 (seed 1): after any rounds, each keeps its own seed
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 9L), (2L, 1L), (2L, 4L)).toDF("id", "label")
    val out = Graphs.labelPropagate(e, seeds, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 9L, 2L -> 1L))
  }

  // ---- deterministicWalks ----------------------------------------------------

  test("deterministicWalks: a single edge forces strict alternation") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graphs.deterministicWalks(e, walkLen = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("step")) -> r.getLong(3)).toMap
    assert(out((1L, 0)) == 1L && out((1L, 1)) == 2L &&
      out((1L, 2)) == 1L && out((1L, 3)) == 2L)
    assert(out((2L, 0)) == 2L && out((2L, 1)) == 1L)
  }

  test("deterministicWalks: every step lands on a graph neighbor and" +
      " two runs are identical") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    def run() = Graphs.deterministicWalks(e, walkLen = 5, walksPerNode = 2)
      .orderBy("start", "w", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq)
    // structural: consecutive steps are adjacent in the undirected graph
    val adj = Set((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }
    val byWalk = a.groupBy(t => (t._1, t._2)).values
    byWalk.foreach { steps =>
      steps.sortBy(_._3).sliding(2).foreach {
        case Array(p, q) => assert(adj.contains((p._4, q._4)))
        case _ =>
      }
    }
    // 4 nodes x 2 walks x 6 steps
    assert(a.length == 4 * 2 * 6)
  }

  // ---- degreeAssortativity -------------------------------------------------

  test("degreeAssortativity: star is perfectly disassortative (r = -1)") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graphs.degreeAssortativity(e).collect().head
    assert(r.getAs[Long]("n") == 6L) // directed doubling
    assert(r.getAs[Double]("r") == -1.0)
  }

  test("degreeAssortativity: regular graph has null r (constant degrees)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = Graphs.degreeAssortativity(e).collect().head
    assert(r.isNullAt(r.fieldIndex("r")))
  }

  // ---- Stats.pearson (global form used by assortativity) -------------------

  test("pearson: global (no group columns) exact on a hand case") {
    // x 1,2,3; y 2,4,6 -> r = 1
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Stats.pearson(df, Seq.empty, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Double]("r") == 1.0)
  }

  // ---- scaledRanksPersonalized ----------------------------------------------

  test("personalized PageRank: one round on an undirected pair by hand") {
    // und edges (1,2),(2,1); seed {1}; r0 = (1e9, 0)
    // contrib 1->2: (1e9*85) div 100 = 850000000; 2->1: 0
    // r1(1) = 150000000 (seed base), r1(2) = 850000000
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = PageRank.scaledRanksPersonalized(e, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 150000000L, 2L -> 850000000L))
  }

  test("personalized PageRank: no seeds in graph -> all ranks zero") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.scaledRanksPersonalized(e, Seq(99L).toDF("id"), 2)
      .collect().map(_.getLong(1))
    assert(out.forall(_ == 0L))
  }

  test("personalized PageRank: mass stays near seeds vs uniform ranks") {
    // chain 1-2-3-4-5 undirected, seed {1}: rank(2) > rank(5)
    val dir = (1L to 4L).map(i => (i, i + 1))
    val e = (dir ++ dir.map(_.swap)).toDF("src", "dst")
    val out = PageRank
      .scaledRanksPersonalized(e, Seq(1L).toDF("id"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) > out(5L))
    assert(out(1L) > 0L && out(5L) >= 0L)
  }
}
