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

  /** Rolling z-score anomaly screen per series: each point scored against
    * the trailing `window` rows STRICTLY BEFORE it (self-exclusion keeps a
    * genuine spike from diluting its own baseline), with sample variance.
    * Adds `z` (null until `minN` history rows exist, or when the history
    * is constant) and `is_anomaly` (`|z| > k`). The standard streaming
    * telemetry/data-quality gate: "is this point surprising given its own
    * recent history".
    *
    * Determinism: `valueCol` must be integer-valued (class-contract
    * scaling, see [[Stats]]); the frame sums are exact LONG sums — the
    * frame is `window`-bounded, so `Σv² ≤ window·max(v)²` stays inside
    * 64 bits for any sane scaling (cents up to ~3·10⁷ at window 1000;
    * this bound is per-FRAME, independent of table size, which is why
    * long is safe here where the grouped statistics use DECIMAL(38,0)).
    * z is one fixed-association double expression over the exact sums —
    * identical bits in any engine. A sliding frame re-evaluates its
    * aggregates per row (O(window) each), so cheap long arithmetic in
    * the frame is also the 100 TB throughput choice (a DECIMAL frame sum
    * measured ~15× slower at window 200). `orderCols` must be a
    * per-series unique ordering.
    *
    * Scale shape: ONE series-keyed window exchange carries all three
    * frame aggregates; per-series partitions must fit an executor (§W1
    * window contract — at 100 TB, series keys are the parallelism unit).
    */
  def rollingZscore(df: DataFrame, seriesCols: Seq[String],
                    orderCols: Seq[String], valueCol: String,
                    window: Int, k: Double, minN: Int = 2): DataFrame = {
    require(seriesCols.nonEmpty, "rollingZscore requires series columns")
    require(window >= minN && minN >= 2, "window must cover minN >= 2 rows")
    val v = col(valueCol).cast("long")
    // PREFIX-SUM frames instead of a bounded sliding frame: Spark
    // re-evaluates a [-window, -1] frame from scratch per row (O(window)
    // per row — measured 3.9 s at window 200 over 100k rows), while an
    // UNBOUNDED-PRECEDING frame is one running accumulator (O(1) per
    // row). frame_sum = cum(-1) − cum(-window-1); sums are exact
    // (DECIMAL(38,0) — a PARTITION-length running Σv² would overflow a
    // long at 100 TB series lengths, unlike the old frame-bounded sums),
    // so the difference equals the direct frame sum exactly and its
    // double cast is bit-identical (both are correctly-rounded casts of
    // the same integer). Both frames share the ONE series-keyed window
    // exchange; the per-row O(window) re-scan is gone.
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wCur = base.rowsBetween(Window.unboundedPreceding, -1L)
    val wLag = base.rowsBetween(Window.unboundedPreceding, -(window.toLong + 1L))
    val zeroDec = lit(0L).cast(dec38)
    val nL = count(v).over(wCur) - count(v).over(wLag)
    val sv = sum(v.cast(dec38)).over(wCur) -
      coalesce(sum(v.cast(dec38)).over(wLag), zeroDec)
    val svv = sum((v * v).cast(dec38)).over(wCur) -
      coalesce(sum((v * v).cast(dec38)).over(wLag), zeroDec)
    val nD = nL.cast("double")
    val svD = sv.cast("double")
    val svvD = svv.cast("double")
    val varN = nD * svvD - svD * svD // n²·(n−1)/n × sample variance ≥ 0
    val z = when(nL >= minN && varN > 0d,
      (v.cast("double") - svD / nD) /
        sqrt(varN / (nD * (nD - 1d))))
    df.withColumn("z", z).withColumn("is_anomaly", abs(col("z")) > k)
  }

  /** Rolling exact median per series over the trailing `window` rows
    * (current row inclusive) — the robust smoother for spike screens
    * (a Hampel-style despiker reads `|v − med|` off this column).
    * Integer-valued input ⇒ the interpolated median is an exact integer
    * or half-integer in ANY engine (lo + (hi−lo)/2 over exactly
    * representable doubles), so the column is hash-exact.
    *
    * Scale shape: one series-keyed window exchange; the exact-percentile
    * aggregate re-evaluates its O(window) frame per row, so cost is
    * rows × window — bound `window` (this is a smoother, not an unbounded
    * running median).
    */
  def rollingMedian(df: DataFrame, seriesCols: Seq[String],
                    orderCols: Seq[String], valueCol: String,
                    window: Int): DataFrame = {
    require(seriesCols.nonEmpty, "rollingMedian requires series columns")
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1).toLong, 0L)
    df.withColumn("med", percentile(col(valueCol), lit(0.5)).over(w))
  }

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

  /** Per-key union of half-open integer intervals `[start, end)` — the
    * gaps-and-islands merge behind availability/coverage analytics
    * ("how much wall-clock did this user's sessions actually cover",
    * "which maintenance windows coalesce"). Overlapping AND touching
    * intervals merge (`[1,3) ∪ [3,5) = [1,5)`). One row per merged
    * island: `island_start, island_end, n_merged`.
    *
    * Classic two-window algorithm on ONE key-ordered exchange: an
    * interval opens a new island iff its start exceeds the running max
    * end of every earlier interval (ordered by start, then end, then
    * input tiebreak); the running count of island-opens is the island
    * id; a grouped agg on (key, island) finishes. Per-key rows must fit
    * an executor's window buffer (the §W1 contract — key on the natural
    * entity, not a global timeline).
    */
  def intervalUnion(df: DataFrame, groupCols: Seq[String],
                    startCol: String, endCol: String): DataFrame = {
    require(groupCols.nonEmpty, "intervalUnion requires group columns")
    val keys = groupCols.map(col)
    val s = col(startCol); val e = col(endCol)
    val ord = Window.partitionBy(keys: _*).orderBy(s.asc, e.asc)
    val runMaxEnd = max(e)
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val opened = df.filter(s.isNotNull && e.isNotNull)
      .withColumn("_new",
        when(runMaxEnd.isNull || s > runMaxEnd, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    opened.groupBy(keys :+ col("_island"): _*)
      .agg(min(s).as("island_start"), max(e).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }
}
