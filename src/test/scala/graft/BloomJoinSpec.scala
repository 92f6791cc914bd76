package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("bloom-pruned join equals the plain join (long keys)") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"), col("l_orderkey"))
    // a computed, selective small side the optimizer can't size up front
    val sup = Tables(spark, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"), col("s_nationkey"))
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("ck"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val bloomed = BloomJoin.inner(li, sup, "l_suppkey", "s_suppkey")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("ck"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(bloomed == plain)
  }

  test("pruning removes non-matching rows before the join") {
    val li = Tables(spark, dir, "lineitem").select(col("l_suppkey"))
    val sup = Tables(spark, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0).select(col("s_suppkey"))
    val bf = BloomJoin.keyBloom(sup, "s_suppkey")
    val full = li.count()
    val kept = BloomJoin.pruneBig(li, "l_suppkey", bf).count()
    // ~1/7 of keys match; with fpp 0.01 the kept fraction must be far
    // below the full scan (loose bound: under half)
    assert(kept < full / 2, s"kept $kept of $full")
    assert(kept > 0)
  }

  test("string keys probe the same encoding the builder used") {
    val big = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .toDF("k")
    val small = Seq("beta", "delta").toDF("k")
    val bf = BloomJoin.keyBloom(small, "k", fpp = 0.001)
    val kept = BloomJoin.pruneBig(big, "k", bf)
      .collect().map(_.getString(0)).toSet
    assert(Set("beta", "delta").subsetOf(kept)) // no false negatives ever
    assert(kept.size <= 3) // at fpp 0.001 on 6 probes, >1 FP is a bug
  }

  test("plan: the bloom probe filters the big side BELOW its exchange") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables(spark, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"), col("s_nationkey"))
    val plan = BloomJoin.inner(li, sup, "l_suppkey", "s_suppkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    // the probe must appear in the big-side subtree, i.e. the plan dump
    // shows it below a join/exchange, not above
    val probeLine = plan.linesIterator.indexWhere(_.contains("bloom_might_contain"))
    val joinLine = plan.linesIterator.indexWhere(l =>
      l.contains("Join") || l.contains("Exchange"))
    assert(joinLine >= 0 && probeLine > joinLine,
      s"probe at line $probeLine, first join/exchange at $joinLine\n$plan")
  }
}
