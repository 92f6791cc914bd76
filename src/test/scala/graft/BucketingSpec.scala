package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** Bucketed co-located join: same bucket count on both sides → the join
  * plans without any Exchange (the write-once/join-many scale pattern).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed fact tables join with zero shuffles") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
      Bucketing.writeBucketed(ord, "b_orders", "l_orderkey", 8)
      // force the shuffle-join path (at this tiny SF Catalyst would
      // broadcast); bucketing must then satisfy the distribution with
      // NO shuffle exchange on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // and the result is the plain join's result
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
