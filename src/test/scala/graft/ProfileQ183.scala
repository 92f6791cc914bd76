package graft

import org.apache.spark.sql.functions._

// Profiling harness (not a test): sbt "Test/runMain graft.ProfileQ183"
// Stage-splits q183 with the exact bench session config so the ≤3 s idle
// budget can be attributed (basket derivation vs mining chain).
object ProfileQ183 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3)
      t(s"TOTAL r$rep")(Queries.q183FrequentTriples(spark, dir)
        .write.mode("overwrite").format("noop").save())
    def tb(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val baskets = t("baskets+ckpt") {
      tb("lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(tb("orders").select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tb("part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("brand"))
        .distinct().localCheckpoint(true)
    }
    val n = t("count")(baskets.select(col("cust")).distinct().count())
    t("mine") {
      operators.Itemsets.frequentTriples(baskets, "cust", "brand",
          math.max(1L, n * 12L / 100L))
        .orderBy(desc("support"), col("item_a"), col("item_b"), col("item_c"))
        .limit(30)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
