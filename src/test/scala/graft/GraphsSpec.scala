package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def edges(rows: Seq[(String, Long)], cap: Int = 1000)
      : Map[(Long, Long), Long] =
    Graphs.coOccurrenceEdges(rows.toDF("g", "i"), "g", "i", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("weights count shared groups; src < dst; duplicates collapse") {
    val rows = Seq(("o1", 1L), ("o1", 2L), ("o1", 3L),
      ("o2", 2L), ("o2", 1L), ("o2", 1L), // dup membership collapses
      ("o3", 9L))                         // singleton group: no pairs
    assert(edges(rows) == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("groups over maxGroupSize are dropped entirely (degenerate-key guard)") {
    val hot = (1L to 10L).map(i => ("hot", i))
    val ok = Seq(("a", 1L), ("a", 2L))
    assert(edges(hot ++ ok, cap = 9) == Map((1L, 2L) -> 1L))
    // at cap = 10 the group is allowed: C(10,2) pairs appear
    assert(edges(hot ++ ok, cap = 10).size == 45)
  }

  test("null groups and items are ignored") {
    val df = Seq((Some("a"), Some(1L)), (Some("a"), Some(2L)),
      (None, Some(3L)), (Some("b"), None)).toDF("g", "i")
    val out = Graphs.coOccurrenceEdges(df, "g", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }
}
