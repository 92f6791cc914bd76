package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial joins over integer-scaled planar coordinates —
  * the "all pairs within distance r" primitive (nearby events, embedding
  * 2-D projections, store/customer proximity) without the quadratic
  * cross join: candidates come from a cell grid of size r (a pair within
  * r NEVER spans more than adjacent cells, so the 3×3 neighborhood is a
  * complete candidate set — zero recall loss, unlike LSH), then the
  * exact integer predicate `dx² + dy² ≤ r²` decides.
  *
  * Scale shape: ONE equi-join on the packed cell key — the left side
  * explodes ×9 (its neighbor cells), the right side carries its own
  * cell only; work is Σ_cell |L_cell|·|R_3×3(cell)|, which for any
  * bounded point density is linear in the points. A pathological
  * all-points-in-one-cell input degrades to the true quadratic answer
  * size itself — the output, not the method, is the bound. Coordinates
  * follow the [[Clustering]] packing contract (cell coords within ±2²⁰).
  */
object Spatial {

  private val Off = 1L << 20
  private val Span = 1L << 21

  private def fdiv(x: Column, c: Long): Column =
    ((x - ((x % c + c) % c)) / c).cast("long")

  private def key(cx: Column, cy: Column): Column =
    (cx + Off) * Span + (cy + Off)

  /** All (left, right) pairs with squared distance ≤ radius² — plus the
    * exact `dist2`. Output: (l_id, r_id, dist2). Self-join callers
    * dedupe with `l_id < r_id`.
    */
  def withinRadiusJoin(left: DataFrame, leftId: String,
                       right: DataFrame, rightId: String,
                       xCol: String, yCol: String,
                       radius: Long): DataFrame = {
    require(radius > 0, s"radius=$radius")
    val r2 = radius * radius
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield lit(dx.toLong * Span + dy)
    val l = left.select(col(leftId).as("l_id"),
        col(xCol).cast("long").as("_lx"), col(yCol).cast("long").as("_ly"))
      .filter(col("_lx").isNotNull && col("_ly").isNotNull)
      .withColumn("_d", explode(array(offsets: _*)))
      .withColumn("_ck",
        col("_d") + key(fdiv(col("_lx"), radius), fdiv(col("_ly"), radius)))
      .drop("_d")
    val r = right.select(col(rightId).as("r_id"),
        col(xCol).cast("long").as("_rx"), col(yCol).cast("long").as("_ry"))
      .filter(col("_rx").isNotNull && col("_ry").isNotNull)
      .withColumn("_ck",
        key(fdiv(col("_rx"), radius), fdiv(col("_ry"), radius)))
    l.join(r, Seq("_ck"))
      .withColumn("dist2",
        (col("_lx") - col("_rx")) * (col("_lx") - col("_rx")) +
          (col("_ly") - col("_ry")) * (col("_ly") - col("_ry")))
      .filter(col("dist2") <= r2)
      .select(col("l_id"), col("r_id"), col("dist2"))
  }
}
