package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-density clustering (DBSCAN-style) over integer-scaled 2-D
  * points: cells of `cellSize` with ≥ `minPts` points are DENSE; dense
  * cells connect to 8-adjacent dense cells; clusters are the connected
  * components of that cell graph; points in dense cells inherit their
  * cell's cluster, points in sparse cells are NOISE (null cluster).
  *
  * This is the density-clustering formulation that scales: exact DBSCAN
  * needs an ε-neighbor join over the points (quadratic in dense
  * regions); the grid collapses points to CELL-domain work — one
  * grouped count, one cells-sized adjacency join, then
  * [[Dedup.starComponents]]' O(log n)-round contraction. The semantics
  * are the documented grid approximation (cell granularity ε ≈
  * cellSize), not ε-ball DBSCAN — deterministic, engine-portable, and
  * SQL-provable (the oracle replays the cell graph through a recursive
  * CTE).
  *
  * Coordinate contract: integer-valued (scale doubles first), cell
  * coordinates within ±2²⁰ (the packed 42-bit cell key) — i.e. raw
  * coords within ±cellSize·2²⁰, far beyond any scaled embedding space.
  * Cluster id = the packed key of the component's smallest cell.
  */
object Clustering {

  private val Off = 1L << 20
  private val Span = 1L << 21

  /** Floor division as plain arithmetic (`x % c` keeps the dividend's
    * sign in both Spark and ANSI engines, so the expression ports
    * verbatim — no engine-specific floor-div operator).
    */
  private def fdiv(x: Column, c: Long): Column =
    // the numerator is an exact multiple of c, so the double division is
    // exact well past 2^52; cast restores the integer key domain
    ((x - ((x % c + c) % c)) / c).cast("long")

  /** Pack (cx, cy) into one long key — order-preserving per axis. */
  private def key(cx: Column, cy: Column): Column =
    (cx + Off) * Span + (cy + Off)

  def gridDensity(df: DataFrame, idCol: String, xCol: String, yCol: String,
                  cellSize: Long, minPts: Long): DataFrame = {
    require(cellSize > 0, s"cellSize=$cellSize")
    require(minPts >= 1, s"minPts=$minPts")
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol), col(xCol), col(yCol),
        key(fdiv(col(xCol).cast("long"), cellSize),
          fdiv(col(yCol).cast("long"), cellSize)).as("_ck"))
    val dense = pts.groupBy(col("_ck")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minPts)
      .select(col("_ck"))
    // 8-neighborhood adjacency between dense cells, one direction
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
      yield lit(dx.toLong * Span + dy)
    val nbr = dense
      .select(col("_ck"), explode(array(offsets: _*)).as("_d"))
      .select(col("_ck"), (col("_ck") + col("_d")).as("_nk"))
      .filter(col("_nk") > col("_ck"))
    val edges = nbr.join(dense.select(col("_ck").as("_nk")), Seq("_nk"))
      .select(col("_ck").as("id_a"), col("_nk").as("id_b"))
    // connectedComponents, not starComponents directly: the dense-cell
    // adjacency is cells-domain sized (≤ 8 edges per dense cell), so the
    // union-find driver path resolves it without per-round contraction
    // shuffles; the distributed star loop remains the >1M-edge fallback
    val comps = Dedup.connectedComponents(edges)
      .select(col("id").as("_ck"), col("component").as("_comp"))
    // singleton dense cells (no dense neighbor) are their own cluster
    val labeled = dense.join(comps, Seq("_ck"), "left")
      .select(col("_ck"), coalesce(col("_comp"), col("_ck")).as("cluster"))
    pts.join(labeled, Seq("_ck"), "left")
      .select(col(idCol), col(xCol), col(yCol), col("cluster"))
  }
}
