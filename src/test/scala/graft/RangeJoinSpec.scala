package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Bucketed range join must equal the naive cross-join + filter. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("pointInInterval == crossJoin+filter on random data, any bucket width") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "t")
    val intervals = (1 to 80).map { i =>
      val s = rnd.nextInt(9500).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(800).toLong)
    }.toDF("iid", "s", "e")

    val naive = points.crossJoin(intervals)
      .filter($"s" <= $"t" && $"t" < $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)

    for (w <- Seq(1L, 64L, 500L, 5000L)) {
      val fast = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"bucketWidth=$w")
    }
  }

  test("degenerate intervals (end <= start) are dropped before the explode") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    // end < start would produce a long DESCENDING cell sequence if exploded
    val intervals = Seq((1L, 9000L, 3L), (2L, 5L, 5L), (3L, 0L, 10L))
      .toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 4L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L)))
  }

  test("plan is an equi-join on the cell, not a cartesian product") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
