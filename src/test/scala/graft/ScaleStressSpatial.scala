package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Spatial}

/** Spatial-tier scale stress (run manually: `sbt "Test/runMain
  * graft.ScaleStressSpatial"`): planted-structure inputs whose answers
  * are CLOSED FORM, at a scale where a recall hole or a quadratic
  * candidate blow-up is visible —
  *
  *  1. within-radius join over a 4M-point lattice (spacing 100, radius
  *     60 — no lattice pair qualifies) with 1000 planted companions at
  *     distance exactly 30 from their hosts and ≥ 70 from everything
  *     else: the result must be EXACTLY the 1000 planted pairs, each
  *     dist² = 900 (cell blocking recall = 1, boundary arithmetic
  *     exact);
  *  2. grid-density clustering over two 1M-point solid blocks a world
  *     apart plus 10k isolated noise points (one per far-flung cell):
  *     exactly TWO clusters, all 2M block points labeled, all 10k noise
  *     points null — density gating and 8-adjacency contraction hold
  *     when every block cell is dense.
  */
object ScaleStressSpatial {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- 1. planted within-radius pairs over a 4M lattice ----
    val side = 2000L
    val lattice = spark.range(side * side).select(
      col("id"),
      (col("id") % side * 100L).as("x"),
      (col("id") / side * 100L).as("y"))
    val planted = spark.range(1000).select(
      (col("id") + side * side).as("id"),
      (col("id") % side * 100L + 30L).as("x"),
      (col("id") / side * 100L).as("y"))
    val pts = lattice.unionAll(planted)
    var t0 = System.nanoTime
    val pairs = Spatial.withinRadiusJoin(pts, "id", pts, "id", "x", "y", 60L)
      .filter(col("l_id") < col("r_id"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("s"),
        min(col("dist2")).as("mn"), max(col("dist2")).as("mx"))
      .collect().head
    val spatialSecs = (System.nanoTime - t0) / 1e9
    println(f"[stress] spatial 4M+1k points: pairs=${pairs.getLong(0)} " +
      f"sum=${pairs.getLong(1)} in $spatialSecs%.1f s")
    require(pairs.getLong(0) == 1000L,
      s"expected exactly the 1000 planted pairs, got ${pairs.getLong(0)}")
    require(pairs.getLong(1) == 900L * 1000 &&
      pairs.getLong(2) == 900L && pairs.getLong(3) == 900L,
      "planted pair distances must all be exactly 900")

    // ---- 2. two solid blocks + isolated noise ----
    val block = 1000L // 1000x1000 points, unit spacing
    def blob(offset: Long) = spark.range(block * block).select(
      (col("id") + offset * 10L).as("id"),
      (col("id") % block + offset).as("x"),
      (col("id") / block + offset).as("y"))
    val noise = spark.range(10000).select(
      (col("id") + 900000000L).as("id"),
      (col("id") % 100L * 100000L + 50000000L).as("x"),
      (col("id") / 100L * 100000L + 50000000L).as("y"))
    val all = blob(0).unionAll(blob(10000000L)).unionAll(noise)
    t0 = System.nanoTime
    val labeled = Clustering.gridDensity(all, "id", "x", "y",
      cellSize = 250L, minPts = 5L)
    val summary = labeled.agg(
      countDistinct(col("cluster")).as("n_clusters"),
      count(when(col("cluster").isNotNull, 1)).as("n_clustered"),
      count(when(col("cluster").isNull, 1)).as("n_noise"))
      .collect().head
    val clusterSecs = (System.nanoTime - t0) / 1e9
    println(f"[stress] cluster 2M+10k points: clusters=${summary.getLong(0)} " +
      f"clustered=${summary.getLong(1)} noise=${summary.getLong(2)} " +
      f"in $clusterSecs%.1f s")
    require(summary.getLong(0) == 2L,
      s"expected exactly 2 clusters, got ${summary.getLong(0)}")
    require(summary.getLong(1) == 2L * block * block, "all block points labeled")
    require(summary.getLong(2) == 10000L, "all noise points null")
    println("[stress] SPATIAL TIER PASS")
    spark.stop()
  }
}
