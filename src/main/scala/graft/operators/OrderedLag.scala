package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable `lag(value) OVER (ORDER BY order)` — the reference computes its
  * PREV_DAY_CO2 with an UNPARTITIONED window
  * (/root/reference/udfs_and_spoc/co2_analytical_sp/co2_analytical_sp/
  * function.py:108-112), which collapses to a single task in Spark. At the
  * 100 TB design point that is the bottleneck, so this operator:
  *
  *   1. partitions the window by a coarse bucket of the order column
  *      (e.g. year(date)) — N parallel window tasks;
  *   2. stitches partition boundaries: the first row of each bucket takes
  *      its lag from the last row of the PREVIOUS non-empty bucket, computed
  *      on a tiny (one row per bucket) aggregate broadcast back.
  *
  * Exact same result as the global window, shuffle-parallel.
  */
object OrderedLag {

  /** Adds `outputCol` = previous `valueCol` by `orderCol` ascending order.
    * `bucket` must be a monotone function of `orderCol` (same order).
    */
  def withLag(df: DataFrame, orderCol: String, valueCol: String,
              outputCol: String, bucket: Column): DataFrame = {
    val B = "_lag_bucket"
    val base = df.withColumn(B, bucket)

    val w = Window.partitionBy(col(B)).orderBy(col(orderCol))
    val withLocal = base
      .withColumn(outputCol, lag(col(valueCol), 1).over(w))
      .withColumn("_is_first", row_number().over(w) === 1)

    // one row per bucket: the value at the max orderCol in that bucket
    val lastPerBucket = base
      .groupBy(col(B))
      .agg(max(struct(col(orderCol), col(valueCol))).as("_m"))
      .select(col(B), col(s"_m.$valueCol").as("_last_v"))
    // previous non-empty bucket's last value. This window runs over ONE ROW
    // PER BUCKET (years), so a single partition is by design. The partition
    // key is the constant 0 computed FROM the bucket column (`B mod 1`):
    // a bare lit(0) is foldable, so Spark 4's EliminateWindowPartitions
    // strips it and WindowExec's no-partition warning (aimed at full-data
    // windows) fires anyway — a non-foldable derived constant keeps the
    // spec and the logs clean.
    val prevBucketLast = lastPerBucket
      .withColumn("_prev_last", lag(col("_last_v"), 1)
        .over(Window.partitionBy(pmod(coalesce(col(B), lit(0)), lit(1)))
          .orderBy(col(B))))
      .select(col(B), col("_prev_last"))

    withLocal
      .join(broadcast(prevBucketLast), Seq(B), "left")
      .withColumn(outputCol,
        when(col("_is_first"), col("_prev_last")).otherwise(col(outputCol)))
      .drop(B, "_is_first", "_prev_last")
  }

  /** Date-ordered convenience: bucket by year(date). */
  def byDate(df: DataFrame, dateCol: String, valueCol: String,
             outputCol: String): DataFrame =
    withLag(df, dateCol, valueCol, outputCol, year(col(dateCol)))
}
