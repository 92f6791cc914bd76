package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation), the standard robust alternative to mean/stddev z-scores —
  * a handful of corrupt readings cannot drag the threshold the way they
  * drag a mean, so the screen stays calibrated on exactly the data it is
  * supposed to catch. The per-group summary (median, MAD, outlier count)
  * is the data-quality dashboard row for a metric column.
  *
  * Exactness: medians are Spark's exact `percentile` (sort-based
  * interpolating, ≡ ANSI `quantile_cont` — same pairing [[DataCard]]
  * pins), and the outlier predicate `|x − med| > k·mad` is evaluated on
  * the identical doubles in any engine, so the whole summary is
  * SQL-oracle-reproducible.
  *
  * Scale shape: two grouped exact-median aggregations (shuffles keyed on
  * the group) with the group-sized median relation joined back (AQE
  * broadcasts it), then one final grouped count — group cardinality never
  * rides a driver collect. Exact medians are the deliberate choice here
  * (the contract is a reproducible audit row); for sketch-grade screening
  * at unbounded group sizes, swap `percentile` for `percentile_approx`
  * and drop the oracle claim.
  */
object Outliers {

  /** One row per group: n, median, MAD, and the count of rows with
    * `|value − median| > k · MAD`. Null values are ignored.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers requires group columns")
    require(k > 0, s"k=$k must be positive")
    val g: Seq[Column] = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull)
      .select(g :+ v.as("_v"): _*)
    val med = rows.groupBy(g: _*)
      .agg(expr("percentile(_v, 0.5)").as("_med"))
    val dev = rows.join(med, groupCols)
      .withColumn("_dev", abs(col("_v") - col("_med")))
    val mad = dev.groupBy(g: _*)
      .agg(expr("percentile(_dev, 0.5)").as("_mad"))
    dev.join(mad, groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        first(col("_med")).as("median"),
        first(col("_mad")).as("mad"),
        sum(when(col("_dev") > col("_mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
