package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph construction from tabular data — the step every graph operator
  * ([[Triangles]], [[KCore]], [[PageRank]], [[Dedup.starComponents]])
  * sits on top of.
  */
object Graphs {

  /** Co-occurrence projection of a bipartite (group, item) relation:
    * undirected item-item edges `(src, dst, weight)` with `src < dst`,
    * weight = number of distinct groups the pair shares (the
    * market-basket / co-citation / co-purchase graph).
    *
    * The 100 TB hazard of this shape is the DEGENERATE GROUP: pair
    * fanout is |g|²/2 per group, so one "null order" / empty-URL-host /
    * boilerplate-dedup-key group with 10⁶ members would emit 5·10¹¹
    * pairs from a single key — the job dies on one straggler partition.
    * Groups larger than `maxGroupSize` are therefore DROPPED, loudly
    * documented as the operator's contract (a hub group's pairs carry no
    * per-pair signal anyway — every pair in it shares only the
    * degenerate key). The size gate is a pre-aggregated `groupBy.count`
    * + semi-join, NOT an unbounded `count().over(partition)` window (the
    * window form re-introduces the very skew it guards against).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 1000): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize=$maxGroupSize must be >= 2")
    val g = df
      .select(col(groupCol).as("_g"), col(itemCol).cast("long").as("_i"))
      .filter(col("_g").isNotNull && col("_i").isNotNull)
      .distinct()
    val small = g.groupBy(col("_g")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxGroupSize)
      .select(col("_g"))
    val keep = g.join(small, Seq("_g"), "left_semi")
    val a = keep.select(col("_g"), col("_i").as("src"))
    val b = keep.select(col("_g"), col("_i").as("dst"))
    a.join(b, Seq("_g"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }
}
