package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the Population Stability Index (PSI)
  * between a BASELINE and a CURRENT value distribution, per group: the
  * standard production gate for "has this feed's distribution moved
  * enough to quarantine the batch / retrain the model" (PSI < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 action).
  *
  * `psi = Σ_buckets (p_b − q_b) · ln(p_b / q_b)` over the shared bucket
  * space, with additive (Laplace) smoothing `(cnt + α) / (n + α·B)` where
  * `B` is the group's bucket-union size — so a bucket present on one side
  * only contributes a finite, smoothing-bounded term instead of ∞, and
  * BOTH sides use the same `B` (the union), keeping the measure symmetric
  * in its domain treatment and exactly reproducible in ANSI SQL.
  *
  * Inputs are HISTOGRAMS `(group…, _v, cnt)` — the exact shape
  * [[IncrementalQuantiles]] maintains incrementally, which makes the
  * end-to-end pattern: keep a baseline histogram table + a rolling
  * current one from commit-log deltas, then diff them in histogram space.
  * Cost is state-sized (groups × buckets), NEVER corpus-sized: the drift
  * check on a 100 TB feed reads two small state relations.
  */
object DriftMonitor {

  /** Per-group PSI between two histograms sharing `groupCols`, `_v`,
    * `cnt`. Returns `(group…, psi, n_base, n_cur)` — one row per group
    * present on EITHER side (a group absent from one side has n = 0 and
    * every bucket smoothing-bounded).
    */
  def psi(base: DataFrame, cur: DataFrame, groupCols: Seq[String],
          alpha: Double = 0.5): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(alpha > 0, "alpha must be positive (division-by-zero guard)")
    val gcols = groupCols.map(col)
    val joined = base.select(gcols :+ col("_v") :+ col("cnt").as("_cb"): _*)
      .join(cur.select(gcols :+ col("_v") :+ col("cnt").as("_cc"): _*),
        groupCols :+ "_v", "full_outer")
      .select(gcols :+ col("_v") :+
        coalesce(col("_cb"), lit(0L)).as("_cb") :+
        coalesce(col("_cc"), lit(0L)).as("_cc"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
    val withTotals = joined
      .withColumn("_nb", sum(col("_cb")).over(w))
      .withColumn("_nc", sum(col("_cc")).over(w))
      .withColumn("_B", count(lit(1)).over(w))
    val p = (col("_cb") + alpha) / (col("_nb") + lit(alpha) * col("_B"))
    val q = (col("_cc") + alpha) / (col("_nc") + lit(alpha) * col("_B"))
    withTotals
      .withColumn("_term", (p - q) * log(p / q))
      .groupBy(gcols: _*)
      // decimal-summed: order-independent (partial-aggregation order is
      // nondeterministic in doubles) and exactly reproducible cross-engine
      .agg(sum(col("_term").cast("decimal(28,14)")).cast("double").as("psi"),
        max(col("_nb")).cast("long").as("n_base"),
        max(col("_nc")).cast("long").as("n_cur"))
  }

  /** Convenience: histogram a raw relation on `valueExpr` (the same
    * bucketing contract as [[IncrementalQuantiles]] — discrete domain or
    * caller-bucketed) and return `(group…, _v, cnt)`.
    */
  def histogram(df: DataFrame, groupCols: Seq[String],
                valueExpr: Column): DataFrame =
    df.withColumn("_v", valueExpr).filter(col("_v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).cast("long").as("cnt"))
}
