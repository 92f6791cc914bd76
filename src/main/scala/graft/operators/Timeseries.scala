package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series linear interpolation over a dense spine: fills each null
  * value from the straight line through the nearest non-null neighbors on
  * either side — the standard gap repair for sensor/metric series before
  * training or aggregation (where [[graft.Queries.q97GapFill]]'s
  * last-observation-carried-forward deliberately holds a step function,
  * this reconstructs the trend through the gap). Leading gaps backfill
  * from the first observation, trailing gaps forward-fill from the last;
  * a series with no observation at all stays null.
  *
  * Exactness: the fill is `pv + (nv − pv) · (x − px) / (nx − px)` on
  * doubles with a fixed association, so any engine computing the same
  * expression over the same neighbors produces the same bits (compare at
  * rounded precision for defense in depth).
  *
  * Scale shape: ONE window shuffle keyed on the series id — the running
  * prev/next observation scans are frame-bounded window aggregates over
  * the same partitioning, so all four neighbor columns ride a single
  * exchange; nothing is collected and no self-join materializes the
  * gap×observation product. The per-series partition must fit an
  * executor, the usual per-key window contract ([[OrderedLag]] §W1).
  */
object Timeseries {

  /** CUSUM change-point detection per series: for each series, the x at
    * which the cumulative sum of mean-deviations `Σ_{t≤x}(v_t − v̄)`
    * attains its maximum absolute value — the classic single-change-point
    * estimator (Page 1954, Biometrika 41): a level shift at time τ makes
    * |CUSUM| peak exactly at τ. Emits one row per series: the argmax x,
    * the peak |CUSUM|, and the series mean — threshold downstream
    * (|peak| relative to n·σ) to decide if the shift is real.
    *
    * Determinism: the mean is one double division of a decimal-exact sum;
    * the running sum is sequential in x order (ties broken by x being
    * unique per series — REQUIRED input contract, aggregate first), so
    * every engine computes identical doubles; compare rounded.
    *
    * Scale shape: one series-keyed grouped agg (mean) joined back
    * (series-sized, AQE broadcasts), one series-keyed window for the
    * running sum, one grouped max + argmax via `max_by`. Per-series rows
    * must fit an executor — the §W1 window contract.
    */
  def cusumChangePoint(df: DataFrame, seriesCols: Seq[String],
                       xCol: String, valueCol: String): DataFrame = {
    require(seriesCols.nonEmpty, "cusumChangePoint requires series columns")
    val keys = seriesCols.map(col)
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull)
      .select((keys :+ col(xCol).as("_x") :+ v.as("_v")): _*)
    val stats = rows.groupBy(keys: _*)
      .agg((sum(col("_v").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double") / count(lit(1))).as("_mean"),
        count(lit(1)).as("n"))
    val run = Window.partitionBy(keys: _*).orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(stats, seriesCols)
      .withColumn("_cusum", sum(col("_v") - col("_mean")).over(run))
      .groupBy(keys: _*)
      .agg(first(col("n")).as("n"), first(col("_mean")).as("mean"),
        expr("min_by(_x, array(-abs(_cusum), _x))").as("change_x"),
        max(abs(col("_cusum"))).as("peak_cusum"))
  }

  /** `df(seriesCols…, xCol numeric, valueCol)` (one row per x per series —
    * build the spine first) → same rows plus `filled` (double) and
    * `fill_kind` ∈ obs | interp | lead | trail | empty.
    */
  def interpolateLinear(df: DataFrame, seriesCols: Seq[String],
                        xCol: String, valueCol: String): DataFrame = {
    require(seriesCols.nonEmpty, "interpolateLinear requires series columns")
    val part = seriesCols.map(col)
    val x = col(xCol).cast("double")
    val v = col(valueCol).cast("double")
    val prev = Window.partitionBy(part: _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val next = Window.partitionBy(part: _*).orderBy(col(xCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(v, ignoreNulls = true).over(prev)
    val px = last(when(v.isNotNull, x), ignoreNulls = true).over(prev)
    val nv = first(v, ignoreNulls = true).over(next)
    val nx = first(when(v.isNotNull, x), ignoreNulls = true).over(next)
    df.withColumn("filled",
        when(v.isNotNull, v)
          .when(pv.isNull && nv.isNull, lit(null).cast("double"))
          .when(pv.isNull, nv)
          .when(nv.isNull, pv)
          .otherwise(pv + (nv - pv) * (x - px) / (nx - px)))
      .withColumn("fill_kind",
        when(v.isNotNull, lit("obs"))
          .when(pv.isNull && nv.isNull, lit("empty"))
          .when(pv.isNull, lit("lead"))
          .when(nv.isNull, lit("trail"))
          .otherwise(lit("interp")))
  }
}
