package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to the intervals containing them,
  * without an equi-key. Catalyst plans a bare `start <= t AND t < end`
  * predicate as a broadcast-nested-loop / cartesian product, which dies at
  * scale.
  *
  * This is the standard bucketed range join: quantize time into
  * `bucketWidth` cells, explode each interval into the cells it covers,
  * equi-join point-cell to interval-cell, then apply the exact range
  * predicate. Shuffle is an ordinary hash exchange on the cell id; each
  * interval is replicated `ceil(len/bucketWidth)+1` times, so pick
  * bucketWidth near the median interval length.
  */
object RangeJoin {

  private val CELL = "_range_cell"

  /** Points `left` (numeric/time column `t`) joined to intervals `right`
    * (`start`, `end`, half-open [start, end)). Columns of both sides are
    * kept; every (point, containing-interval) pair is emitted.
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      t: String, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = left.withColumn(CELL, floor(col(t).cast("long") / bucketWidth))
    // Degenerate intervals (end <= start) match nothing under the half-open
    // predicate, but a start > stop sequence() would generate a DESCENDING
    // cell list and replicate such rows across many cells before the exact
    // filter drops them — so drop them before the explode.
    val ivs = right
      .filter(col(end) > col(start))
      .withColumn(CELL,
        explode(sequence(
          floor(col(start).cast("long") / bucketWidth),
          floor((col(end).cast("long") - 1) / bucketWidth))))
    pts.join(ivs, Seq(CELL))
      .filter(col(start) <= col(t) && col(t) < col(end))
      .drop(CELL)
  }
}
