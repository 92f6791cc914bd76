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

  /** Per-group trimmed mean of an INTEGER-VALUED column (floor-scale
    * currency to cents first — the [[Stats]] contract): drop the
    * `floor(p·n)` smallest and largest rows, average the rest. The
    * robust location estimate that, unlike the median, still uses the
    * bulk of the data. One row per group: `n, n_trimmed (per side),
    * trimmed_mean` (the decimal-exact sum of the kept rows over one
    * double division; null when nothing survives, i.e. p ≥ 0.5).
    *
    * Determinism under ties: the rank cut may split a tie block, but
    * every row in the block holds the SAME value, so the kept-row SUM —
    * and hence the mean — does not depend on which tied rows the sort
    * put inside the cut.
    *
    * Scale shape: one group-keyed window rank + one grouped agg on the
    * same key (§W1 per-group contract).
    */
  def trimmedMean(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Double): DataFrame = {
    require(groupCols.nonEmpty, "trimmedMean requires group columns")
    require(p >= 0 && p < 0.5, s"p=$p must be in [0, 0.5)")
    val g: Seq[Column] = groupCols.map(col)
    val v = col(valueCol)
    val part = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val ranked = df.filter(v.isNotNull)
      .select(g :+ v.as("_v") :+
        row_number().over(part.orderBy(v.asc)).as("_ra") :+
        row_number().over(part.orderBy(v.desc)).as("_rd"): _*)
      .withColumn("_cut", floor(lit(p) * count(lit(1)).over(part)))
    val kept = col("_ra") > col("_cut") && col("_rd") > col("_cut")
    ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), first(col("_cut")).as("n_trimmed"),
        count(when(kept, 1)).as("_kept"),
        sum(when(kept,
          col("_v").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .as("_ksum"))
      .withColumn("trimmed_mean",
        when(col("_kept") > 0,
          col("_ksum").cast("double") / col("_kept").cast("double")))
      .select(g ++ Seq(col("n"), col("n_trimmed"), col("trimmed_mean")): _*)
  }
}
