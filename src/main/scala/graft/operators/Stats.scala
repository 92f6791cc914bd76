package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact per-group second-order statistics: OLS linear fit, Spearman rank
  * correlation, and lagged autocorrelation — the screening statistics a
  * training-data pipeline runs before trusting a numeric column (is this
  * metric drifting with time? do these two fields encode the same signal?).
  *
  * Reference scope: the reference's analytics layer stops at grouped
  * sums/averages (`co2_analytical_sp/function.py` daily/weekly rollups);
  * these close the gap to the standard correlation/trend screens run on
  * the same shaped series.
  *
  * Determinism discipline (the repo's scaled-integer contract, SURVEY §6):
  * callers pass INTEGER-VALUED x/y columns (scale doubles to cents/micros
  * with `floor(v * 100)` — floor, not cast: DuckDB's double→int cast
  * rounds, Spark's truncates). All five moments (Σx, Σy, Σxy, Σx², Σy²)
  * accumulate in DECIMAL(38,0) — exact, order-independent — and every
  * derived statistic is ONE fixed-association double expression over those
  * exact sums, so any engine computing the same formula produces the same
  * bits. Compare rounded for defense in depth.
  *
  * Scale shape: each statistic is a single hash-partitioned groupBy over
  * the group keys with map-side partial aggregation — no window over the
  * raw rows (linearFit/pearson), or exactly the per-series window the
  * semantics require (spearman's ranks, autocorr's lag), keyed on the
  * group so one exchange serves all derived columns. Nothing is collected;
  * output is groups-sized.
  */
object Stats {

  private val bigDec = DecimalType(38, 0)

  /** Exact Σ in DECIMAL(38,0) of an integer-valued column product. */
  private def esum(c: Column): Column = sum(c.cast(bigDec))

  /** The five exact moments → (n, sx, sy, sxy, sxx, syy) double columns
    * plus the shared covariance parts:
    * num = n·Σxy − Σx·Σy, dx = n·Σx² − (Σx)², dy = n·Σy² − (Σy)².
    */
  private def momentAggs(x: Column, y: Column): Seq[Column] = Seq(
    count(lit(1)).as("_n"),
    esum(x).as("_sx"), esum(y).as("_sy"),
    esum(x * y).as("_sxy"), esum(x * x).as("_sxx"), esum(y * y).as("_syy"))

  private def covParts(df: DataFrame): DataFrame = {
    val nD = col("_n").cast("double")
    val sxD = col("_sx").cast("double"); val syD = col("_sy").cast("double")
    df.withColumn("_num", nD * col("_sxy").cast("double") - sxD * syD)
      .withColumn("_dx", nD * col("_sxx").cast("double") - sxD * sxD)
      .withColumn("_dy", nD * col("_syy").cast("double") - syD * syD)
  }


  /** Per-group simple OLS fit `y ≈ intercept + slope·x` (+ Pearson r²):
    * one row per group with `n, slope, intercept, r2`. Degenerate groups
    * (constant x) get null slope/intercept/r2; r2 is additionally null
    * when y is constant (0/0). x and y MUST be integer-valued (see the
    * class doc's scaling contract).
    */
  def linearFit(df: DataFrame, groupCols: Seq[String],
                xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "linearFit requires group columns")
    val x = col(xCol); val y = col(yCol)
    val sums = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(momentAggs(x, y).head, momentAggs(x, y).tail: _*)
    val p = covParts(sums)
    val nD = col("_n").cast("double")
    val slope = when(col("_dx") > 0d, col("_num") / col("_dx"))
    p.withColumn("slope", slope)
      .withColumn("intercept",
        (col("_sy").cast("double") - slope * col("_sx").cast("double")) / nD)
      .withColumn("r2",
        when(col("_dx") > 0d && col("_dy") > 0d,
          col("_num") * col("_num") / (col("_dx") * col("_dy"))))
      .select(groupCols.map(col) ++
        Seq(col("_n").as("n"), col("slope"), col("intercept"), col("r2")): _*)
  }

  /** Per-group Pearson correlation of two integer-valued columns — one
    * row per group with `n, r` (null when either side is constant).
    * `groupCols` may be EMPTY for a global single-row correlation (the
    * grouped form of every other statistic here stays mandatory-keyed).
    * Exactness contract as [[linearFit]].
    */
  def pearson(df: DataFrame, groupCols: Seq[String],
              xCol: String, yCol: String): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val sums = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(momentAggs(x, y).head, momentAggs(x, y).tail: _*)
    covParts(sums)
      .withColumn("r",
        when(col("_dx") > 0d && col("_dy") > 0d,
          col("_num") / sqrt(col("_dx") * col("_dy"))))
      .select(groupCols.map(col) ++ Seq(col("_n").as("n"), col("r")): _*)
  }

  /** Per-group Spearman rank correlation between two integer-valued
    * columns, with standard average ranks for ties. Ranks are held at 2×
    * scale so tied average ranks (…·.5) stay integers:
    * `2·avgrank = rank_asc + n + 1 − rank_desc` (for a tie block, asc rank
    * is the block's min rank and `n + 1 − rank_desc` its max). ρ is then
    * the Pearson of the scaled ranks — the ×2 cancels. One row per group:
    * `n, rho` (null when either side is constant).
    *
    * Scale shape: two rank windows + the count ride ONE group-keyed
    * exchange (same partitioning, different sort orders); the moment
    * aggregation reuses the same hash family.
    */
  def spearman(df: DataFrame, groupCols: Seq[String],
               xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "spearman requires group columns")
    val keys = groupCols.map(col)
    val part = Window.partitionBy(keys: _*)
    def rank2(c: Column): Column =
      rank().over(part.orderBy(c.asc)) +
        count(lit(1)).over(part) + lit(1) -
        rank().over(part.orderBy(c.desc))
    val ranked = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys :+ rank2(col(xCol)).as("_rx") :+
        rank2(col(yCol)).as("_ry"): _*)
    val sums = ranked.groupBy(keys: _*)
      .agg(momentAggs(col("_rx"), col("_ry")).head,
        momentAggs(col("_rx"), col("_ry")).tail: _*)
    covParts(sums)
      .withColumn("rho",
        when(col("_dx") > 0d && col("_dy") > 0d,
          col("_num") / sqrt(col("_dx") * col("_dy"))))
      .select(keys ++ Seq(col("_n").as("n"), col("rho")): _*)
  }

  /** Chi-square test of independence between two categorical columns —
    * ONE row: `n`, `dof = (|A|−1)(|B|−1)`, and `chi2_ppm` = the statistic
    * scaled by 10⁶ and held as an exact long sum (each cell's
    * `(o·n − rt·ct)² / (n·rt·ct)` is one fixed double expression over
    * exact counts, floored to a long at ppm scale — so the SUM is
    * order-independent where a float sum would not be). Zero-observed
    * cells are materialized by the A×B cross join (they still contribute
    * their expected mass). The first independence screen run between any
    * two metadata fields of a corpus ("is `lang` independent of
    * `source`?").
    *
    * Scale shape: one grouped count over the raw rows; everything after
    * is domain-sized (|A|×|B| cells — categorical domains, so the cross
    * join is deliberate and bounded; AQE broadcasts the marginals).
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val rt = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_rt"))
    val ct = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_ct"))
    val full = rt.crossJoin(ct)
      .join(cells, Seq("_a", "_b"), "left")
      .withColumn("_o", coalesce(col("_o"), lit(0L)))
    val n = full.agg(sum(col("_o"))).withColumnRenamed("sum(_o)", "_n")
    val term = {
      val oD = col("_o").cast("double"); val nD = col("_n").cast("double")
      val rtD = col("_rt").cast("double"); val ctD = col("_ct").cast("double")
      val d = oD * nD - rtD * ctD
      floor(lit(1e6) * (d * d) / (nD * rtD * ctD))
    }
    full.crossJoin(n)
      .agg(first(col("_n")).as("n"),
        ((countDistinct(col("_a")) - 1) *
          (countDistinct(col("_b")) - 1)).as("dof"),
        sum(term).as("chi2_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `ga` and `gb`
    * slices of a group column — `D = max |F_a(x) − F_b(x)|`, the
    * distribution-shift test that sees SHAPE changes PSI's fixed buckets
    * blur. ONE row: `n_a, n_b, d_ppm` where
    * `d_ppm = max|cum_a·n_b − cum_b·n_a| · 10⁶ div (n_a·n_b)` — the max
    * runs over exact integers (no float CDFs), the final share is one
    * 128-bit-safe integral division (DECIMAL(38,0) on the Spark side,
    * HUGEINT in an oracle).
    *
    * Scale shape: the raw rows collapse to VALUE-GRANULARITY counts
    * first (one hash groupBy), so the ordered CDF window runs over the
    * distinct-value domain, not the rows — integer-valued inputs
    * (cents) make that domain bounded by construction. The single
    * global sort is inherent to a CDF supremum; it sorts the domain,
    * never the data.
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
             ga: String, gb: String): DataFrame = {
    require(ga != gb, "the two samples must be different groups")
    val g = col(groupCol); val v = col(valueCol)
    val byValue = df.filter(v.isNotNull && (g === ga || g === gb))
      .groupBy(v.as("_v"))
      .agg(count(when(g === ga, 1)).as("_ca"),
        count(when(g === gb, 1)).as("_cb"))
    // single-task domain cumulation kept DELIBERATELY: a two-phase
    // bucketed variant ([[bucketedCumSums]], the weightedQuantile device)
    // was A/B'd here (r13) and lost ~0.15 s/query at sf0.1 — the extra
    // exchange + broadcast join outweighs the tiny serial window on this
    // operator's bounded value domain. Revisit only if the domain grows
    // past ~10⁶ distinct values.
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue
      .select(sum(col("_ca")).over(w).as("_cuma"),
        sum(col("_cb")).over(w).as("_cumb"))
    val totals = byValue.agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
    cum.crossJoin(totals)
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(col("_cuma") * col("n_b") - col("_cumb") * col("n_a")))
          .as("_dnum"))
      .selectExpr("n_a", "n_b",
        "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
          "CAST(_dnum AS DECIMAL(38,0)) * 1000000 div " +
          "CAST(n_a * n_b AS DECIMAL(38,0)) END AS d_ppm")
  }

  /** 1-D Wasserstein-1 (earth mover's) distance between the `ga` and
    * `gb` slices: `W₁ = ∫|F_a − F_b| dv`, the INTEGRAL companion of
    * [[ksTest]]'s supremum — KS sees the worst point of disagreement,
    * W₁ sees the total transported mass (in value units, here whatever
    * the caller's integer scaling is). Computed exactly:
    * `num = Σᵢ |cum_aᵢ·n_b − cum_bᵢ·n_a| · (vᵢ₊₁ − vᵢ)` over
    * value-granularity integer counts (DECIMAL(38,0) accumulation), then
    * ONE double division by `n_a·n_b`. One row:
    * `n_a, n_b, w1` (null when either slice is empty).
    *
    * Scale shape: identical to [[ksTest]] — the ordered window runs over
    * the bounded distinct-value domain, never the rows.
    */
  def wasserstein1(df: DataFrame, groupCol: String, valueCol: String,
                   ga: String, gb: String): DataFrame = {
    require(ga != gb, "the two samples must be different groups")
    val g = col(groupCol); val v = col(valueCol)
    val byValue = df.filter(v.isNotNull && (g === ga || g === gb))
      .groupBy(v.as("_v"))
      .agg(count(when(g === ga, 1)).as("_ca"),
        count(when(g === gb, 1)).as("_cb"))
    val w = Window.orderBy(col("_v"))
    val cum = byValue
      .select(col("_v"),
        sum(col("_ca")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("_cuma"),
        sum(col("_cb")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("_cumb"),
        lead(col("_v"), 1).over(w).as("_nv"))
      .filter(col("_nv").isNotNull)
    val totals = byValue.agg(sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"))
    cum.crossJoin(totals)
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        coalesce(sum(abs(col("_cuma") * col("n_b") -
            col("_cumb") * col("n_a")).cast(bigDec) *
          (col("_nv") - col("_v"))), lit(0L).cast(bigDec)).as("_num"))
      .withColumn("w1",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double")))
      .select(col("n_a"), col("n_b"), col("w1"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) between the `ga` and
    * `gb` slices: `U_a` held at 2× scale (`u_a2 = 2·R_a − n_a(n_a+1)`,
    * average ranks for ties — all integers), plus the tie-corrected
    * normal approximation `z` as one fixed double expression over the
    * exact ingredients (`Σ(t³−t)` tie mass included). The location-shift
    * test that needs no distributional assumption. ONE row:
    * `n_a, n_b, u_a2, z`.
    *
    * Scale shape: identical to [[ksTest]] — value-granularity counts,
    * one domain-sized ordered window (per-value average ranks derive
    * from the running total), one global agg.
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
                   ga: String, gb: String): DataFrame = {
    require(ga != gb, "the two samples must be different groups")
    val g = col(groupCol); val v = col(valueCol)
    val byValue = df.filter(v.isNotNull && (g === ga || g === gb))
      .groupBy(v.as("_v"))
      .agg(count(when(g === ga, 1)).as("_ca"),
        count(when(g === gb, 1)).as("_cb"))
      .withColumn("_t", col("_ca") + col("_cb"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // avg rank (2x) of every row holding value v:
    //   2·cum_before + t + 1  =  2·(cum_through − t) + t + 1
    // (single-task domain window kept — see the ksTest A/B note)
    val ranked = byValue
      .withColumn("_cumt", sum(col("_t")).over(w))
      .withColumn("_r2", lit(2) * (col("_cumt") - col("_t")) + col("_t") + 1)
    val agg = ranked.agg(
      sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"),
      sum(col("_ca") * col("_r2")).as("_ra2"),
      sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_ties"))
    agg.withColumn("u_a2",
        col("_ra2") - col("n_a") * (col("n_a") + 1))
      .withColumn("z", {
        val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
        val nD = naD + nbD
        val sig = sqrt(naD * nbD / 12d *
          (nD + 1d - col("_ties").cast("double") / (nD * (nD - 1d))))
        when(sig > 0d,
          (col("u_a2").cast("double") / 2d - naD * nbD / 2d) / sig)
      })
      .select(col("n_a"), col("n_b"), col("u_a2"), col("z"))
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies — "how much does knowing A tell you about B"
    * in nats, the effect-size companion of [[chiSquare]]'s significance
    * (and H(B|A) = hy − mi, IG-ratio = mi/hx read straight off the row).
    * ONE row: `n, mi, hx, hy` — each statistic a sum of per-cell terms
    * FLOORED to micro-nat·count longs (`Σ floor(10⁶·o·ln(o·n/(rt·ct)))`
    * etc. — a float entropy sum is order-dependent, a long sum is not)
    * over exact counts, divided once by `10⁶·n`. Zero cells contribute
    * exactly 0 (no A×B cross join needed, unlike chi-square's expected
    * mass).
    *
    * Scale shape: one grouped count over raw rows, then
    * categorical-domain-sized marginals and one global agg.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val rt = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_rt"))
    val ct = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_ct"))
    val n = cells.agg(sum(col("_o")).as("_n"))
    def entSum(counts: DataFrame, c: String): DataFrame =
      counts.agg(coalesce(sum(floor(lit(1e6) * col(c).cast("double") *
        log(col(c).cast("double")))), lit(0L)).as(s"${c}_es"))
    val miSum = cells.join(rt, "_a").join(ct, "_b").crossJoin(n)
      .agg(coalesce(sum(floor(lit(1e6) * col("_o").cast("double") *
          log(col("_o").cast("double") * col("_n").cast("double") /
            (col("_rt").cast("double") * col("_ct").cast("double"))))),
        lit(0L)).as("_mi_es"))
    val out = n.crossJoin(miSum)
      .crossJoin(entSum(rt, "_rt")).crossJoin(entSum(ct, "_ct"))
    val nD = col("_n").cast("double")
    out.select(col("_n").as("n"),
      (col("_mi_es").cast("double") / (lit(1e6) * nD)).as("mi"),
      (log(nD) - col("_rt_es").cast("double") / (lit(1e6) * nD)).as("hx"),
      (log(nD) - col("_ct_es").cast("double") / (lit(1e6) * nD)).as("hy"))
  }

  /** Per-group Shannon entropy of a categorical column — the diversity
    * screen ("how varied is each user's event mix", "is this source a
    * single-template bot"): one row per group with `n, n_distinct,
    * entropy` in nats. Entropy terms are floored micro-nat·count longs
    * (the [[mutualInfo]] device) so the per-group sum is exact;
    * `entropy = ln(n) − Σfloor(10⁶·c·ln c)/(10⁶·n)`.
    * Two grouped aggs on the same key family.
    */
  def categoricalEntropy(df: DataFrame, groupCols: Seq[String],
                         catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "categoricalEntropy requires group columns")
    val keys = groupCols.map(col)
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(keys :+ col(catCol).as("_c"): _*)
      .agg(count(lit(1)).as("_o"))
    counts.groupBy(keys: _*)
      .agg(sum(col("_o")).as("n"), count(lit(1)).as("n_distinct"),
        sum(floor(lit(1e6) * col("_o").cast("double") *
          log(col("_o").cast("double")))).as("_es"))
      .withColumn("entropy",
        log(col("n").cast("double")) -
          col("_es").cast("double") / (lit(1e6) * col("n").cast("double")))
      .select(keys ++ Seq(col("n"), col("n_distinct"), col("entropy")): _*)
  }

  /** Exact ROC-AUC of an integer score against a boolean label — the
    * rank statistic (`AUC = U⁺/(n⁺·n⁻)`, ties by average rank), so no
    * threshold sweep and no float CDF: average ranks at 2× scale (the
    * [[spearman]] device) make `u2 = 2·R⁺ − n⁺(n⁺+1)` an exact long and
    * AUC one double division. The first metric of any classifier-scored
    * corpus filter. ONE row: `n_pos, n_neg, auc` (null if either class
    * is empty).
    *
    * Scale shape: value-granularity counts + one domain-sized ordered
    * window (the [[ksTest]] shape) — per-value average ranks derive from
    * the running total, so raw rows never sort.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val lbl = col(labelCol).cast("boolean"); val v = col(scoreCol)
    val byValue = df.filter(v.isNotNull && lbl.isNotNull)
      .groupBy(v.as("_v"))
      .agg(count(when(lbl, 1)).as("_cp"), count(when(!lbl, 1)).as("_cn"))
      .withColumn("_t", col("_cp") + col("_cn"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // (single-task domain window kept — see the ksTest A/B note)
    val ranked = byValue
      .withColumn("_cumt", sum(col("_t")).over(w))
      .withColumn("_r2", lit(2) * (col("_cumt") - col("_t")) + col("_t") + 1)
    ranked.agg(sum(col("_cp")).as("n_pos"), sum(col("_cn")).as("n_neg"),
        sum(col("_cp") * col("_r2")).as("_rp2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("_rp2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2d) * col("n_pos").cast("double") *
              col("n_neg").cast("double"))))
      .select(col("n_pos"), col("n_neg"), col("auc"))
  }

  /** Reliability (calibration) table of a ppm-scaled score in [0, 10⁶)
    * against a boolean label: per equal-width score bucket, the count,
    * mean confidence and observed positive rate — all exact ppm integers
    * (`div`) — the table an Expected-Calibration-Error or reliability
    * diagram reads directly. One grouped pass; buckets-sized output.
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val sc = col(scoreCol).cast("long"); val lbl = col(labelCol).cast("boolean")
    df.filter(sc.isNotNull && lbl.isNotNull)
      .withColumn("_b", least(lit(buckets - 1),
        expr(s"${scoreCol} * ${buckets} div 1000000").cast("int")))
      .groupBy(col("_b").as("bucket"))
      .agg(count(lit(1)).as("n"),
        expr(s"sum($scoreCol) div count(1)").as("conf_ppm"),
        expr("sum(CASE WHEN " + labelCol +
          " THEN 1000000 ELSE 0 END) div count(1)").as("obs_ppm"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelings of the same rows (annotator-vs-annotator, stored-label vs
    * classifier, the standard "is my weak labeler better than chance"
    * gate). ONE row: `n`, `agree` (diagonal count), and `kappa` computed
    * as the single double division of two exact longs:
    * `kappa = (po − pe)/(1 − pe) = (agree·n − Σ_c rt_c·ct_c) /
    * (n² − Σ_c rt_c·ct_c)`. Null when pe = 1 (both sides constant —
    * kappa undefined). Scale shape: one grouped count over raw rows,
    * then category-domain-sized marginals (AQE broadcasts).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val rt = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_rt"))
    val ct = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_ct"))
    val stats = cells.agg(sum(col("_o")).as("n"),
      coalesce(sum(when(col("_a") === col("_b"), col("_o"))), lit(0L))
        .as("agree"))
    val peN2 = rt.join(ct, col("_a") === col("_b"))
      .agg(coalesce(sum(col("_rt") * col("_ct")), lit(0L)).as("_pe_n2"))
    stats.crossJoin(peN2)
      .select(col("n"), col("agree"),
        when(col("n") * col("n") - col("_pe_n2") =!= 0L,
          (col("agree") * col("n") - col("_pe_n2")).cast("double") /
            (col("n") * col("n") - col("_pe_n2")).cast("double"))
          .as("kappa"))
  }

  /** Benford first-digit screen over a positive integer-valued column
    * (floor-scale currency to cents first): per leading digit 1–9, the
    * observed count, observed ppm (`n·10⁶ div total` — exact integer
    * division), and the Benford-law expectation
    * `floor(10⁶·log₁₀(1 + 1/d))`. The classic fabricated-data /
    * broken-ETL detector. The digit comes from the integer's DECIMAL
    * STRING (engine-identical), not from float log arithmetic.
    * One grouped count (9 groups) + one broadcast total.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val counts = df.filter(v.isNotNull && v > 0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_t"))
    val expPpm = (d: Column) =>
      floor(lit(1e6) * log10(lit(1.0) + lit(1.0) / d.cast("double")))
    counts.crossJoin(total)
      .select(col("digit"), col("n"),
        expr("n * 1000000 div _t").as("obs_ppm"),
        expPpm(col("digit")).as("exp_ppm"))
  }

  /** Per-group Gini coefficient of a non-negative integer-valued column:
    * `G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n` over the ascending sort —
    * the concentration measure behind "how skewed is revenue across
    * customers / token mass across documents". Tie order does not matter
    * (equal x swap freely in Σ i·x), both sums are decimal-exact, and G
    * is one fixed double expression. Null when the group sums to zero.
    *
    * Scale shape: one group-keyed window sort for the ranks + one grouped
    * agg on the same key; per-group rows must fit an executor (§W1).
    */
  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "gini requires group columns")
    val keys = groupCols.map(col)
    val v = col(valueCol)
    val w = Window.partitionBy(keys: _*).orderBy(v.asc)
    val ranked = df.filter(v.isNotNull && v >= 0)
      .select(keys :+ v.as("_v") :+ row_number().over(w).as("_i"): _*)
    ranked.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), esum(col("_v")).as("_sx"),
        esum(col("_i") * col("_v")).as("_six"))
      .withColumn("gini", {
        val nD = col("n").cast("double")
        when(col("_sx") > 0,
          lit(2d) * col("_six").cast("double") /
            (nD * col("_sx").cast("double")) - (nD + 1d) / nD)
      })
      .select(keys ++ Seq(col("n"), col("gini")): _*)
  }

  /** Welch's two-sample t statistic between the `ga` and `gb` slices of a
    * group column — the unequal-variance mean-shift test (the A/B answer
    * [[mannWhitneyU]] gives rank-free). ONE row: `n_a, n_b, t, df` with
    * the Welch–Satterthwaite degrees of freedom; both are single fixed
    * double expressions over exact DECIMAL(38,0) moments (Σx, Σx² per
    * slice — one conditional-aggregate pass, no window, no sort). Null
    * t/df when either slice has < 2 rows or both variances are 0.
    * Values integer-valued per the class scaling contract.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             ga: String, gb: String): DataFrame = {
    require(ga != gb, "the two samples must be different groups")
    val g = col(groupCol); val v = col(valueCol)
    val agg = df.filter(v.isNotNull && (g === ga || g === gb))
      .agg(count(when(g === ga, 1)).as("n_a"),
        count(when(g === gb, 1)).as("n_b"),
        esum(when(g === ga, v)).as("_s1a"),
        esum(when(g === ga, v * v)).as("_s2a"),
        esum(when(g === gb, v)).as("_s1b"),
        esum(when(g === gb, v * v)).as("_s2b"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val s1a = col("_s1a").cast("double"); val s2a = col("_s2a").cast("double")
    val s1b = col("_s1b").cast("double"); val s2b = col("_s2b").cast("double")
    val va = (naD * s2a - s1a * s1a) / (naD * (naD - 1d))
    val vb = (nbD * s2b - s1b * s1b) / (nbD * (nbD - 1d))
    val sea = va / naD; val seb = vb / nbD
    val se2 = sea + seb
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0d,
        (s1a / naD - s1b / nbD) / sqrt(se2)).as("t"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0d,
        se2 * se2 / (sea * sea / (naD - 1d) + seb * seb / (nbD - 1d)))
        .as("df"))
  }

  /** Per-group distribution-moments profile: `n, mean, variance` (sample,
    * n−1), `skewness` (population g₁) and `kurt_excess` (g₂ = n·M₄/M₂²−3)
    * — the one-pass shape screen run on every numeric column before
    * trusting it (heavy tail? asymmetric? near-normal?). All four power
    * sums Σx..Σx⁴ accumulate in DECIMAL(38,0) — the x⁴ PRODUCT is formed
    * in decimal too (a cents-scaled value overflows a long at |x| >
    * ~55 000), which bounds the caller's scale contract at
    * |x| ≤ ~3·10⁷ for 10⁹-row groups (Σx⁴ < 10³⁸). Each output is one
    * fixed double expression over the exact sums; skew/kurt null when
    * the group is constant (M₂ = 0) or n < 2.
    *
    * Scale shape: one hash groupBy with map-side partial aggregation —
    * nothing else.
    */
  def momentsProfile(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "momentsProfile requires group columns")
    val keys = groupCols.map(col)
    val x = col(valueCol).cast(bigDec)
    val sums = df.filter(col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("_s1"), sum(x * x).as("_s2"),
        sum(x * x * x).as("_s3"), sum(x * x * x * x).as("_s4"))
    val nD = col("n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val s3 = col("_s3").cast("double"); val s4 = col("_s4").cast("double")
    val m2 = s2 - s1 * s1 / nD
    val m3 = s3 - lit(3d) * s1 * s2 / nD + lit(2d) * s1 * s1 * s1 / (nD * nD)
    val m4 = s4 - lit(4d) * s1 * s3 / nD +
      lit(6d) * s1 * s1 * s2 / (nD * nD) -
      lit(3d) * s1 * s1 * s1 * s1 / (nD * nD * nD)
    sums.select(keys ++ Seq(col("n"),
      (s1 / nD).as("mean"),
      when(col("n") >= 2, m2 / (nD - 1d)).as("variance"),
      // m2·√m2, not pow(m2, 1.5): sqrt is IEEE-correctly-rounded on
      // every engine, pow is not — the bit-reproducibility contract
      when(col("n") >= 2 && m2 > 0d,
        sqrt(nD) * m3 / (m2 * sqrt(m2))).as("skewness"),
      when(col("n") >= 2 && m2 > 0d,
        nD * m4 / (m2 * m2) - 3d).as("kurt_excess")): _*)
  }

  /** Cumulative Poisson(1) CDF thresholds F(0)..F(9) — shared verbatim
    * with oracle SQL so the weight draw is engine-identical.
    */
  private[graft] val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974021,
    0.9999998885745217)

  /** Per-group bootstrap confidence interval for the MEAN of an
    * integer-valued column, via the POISSON bootstrap (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012) —
    * the resampling scheme that works when n is too large to index: each
    * (row, replicate) draws a Poisson(1) weight instead of multinomial
    * counts, so no global n is needed at draw time and the draw is
    * id-pure (md5(seed:id:rep) → uniform → inverse-CDF through
    * [[PoissonCdf]]) — reruns, retries, and repartitions reproduce the
    * interval bit-for-bit, and an ANSI oracle can replay it.
    *
    * Output, one row per group: `n` (rows), `mean` (full-sample point
    * estimate), `n_reps` (replicates with nonzero total weight — a
    * replicate that draws all zeros is dropped, identically on any
    * engine), `lo`/`hi` — the order statistics of the replicate means at
    * `floor(α/2·(R−1))` / `ceil((1−α/2)·(R−1))` (0-based, ties broken
    * by replicate id).
    *
    * Scale shape: the replicate explosion is (rows × reps) but only
    * (key, weight·value) wide and collapses through map-side partial
    * aggregation — the shuffle is (groups × reps) rows, NOT data-sized.
    * The order-statistic window sorts reps-sized groups. Explode cost is
    * the textbook Poisson-bootstrap trade: reps ≈ 100–500 scans' worth
    * of CPU in ONE pass, zero extra I/O passes.
    */
  def bootstrapMeanCI(df: DataFrame, groupCols: Seq[String], idCol: String,
                      valueCol: String, reps: Int = 200, seed: Long = 42L,
                      alpha: Double = 0.05): DataFrame = {
    require(groupCols.nonEmpty, "bootstrapMeanCI requires group columns")
    require(reps >= 2, s"reps=$reps must be >= 2")
    require(alpha > 0 && alpha < 1, s"alpha=$alpha out of (0,1)")
    val keys = groupCols.map(col)
    val v = col(valueCol)
    // the replicate explode multiplies ROWS, not partitions: a compact
    // input (one parquet file) would run the whole rows×reps pass on
    // one core. One rows-sized hash exchange on the id re-spreads it —
    // negligible next to the ×reps compute it unlocks.
    val base = df.filter(v.isNotNull)
      .select(keys :+ col(idCol).cast("string").as("_id") :+ v.as("_v"): _*)
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("_id"))
    val full = base.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        (esum(col("_v")).cast("double") / count(lit(1))).as("mean"))
    // first 52 md5 bits via the fused md5_head60 kernel (>> 8 drops hex
    // chars 14-15): value-identical to the SQL chain
    // conv(substring(md5(x), 1, 13), 16, 10) the oracle replays — the
    // 60-bit head is the first 15 hex chars, so head >> 8 is the first 13
    // — but skips materializing the 32-char hex string, the substring
    // copy and the base-16 parse on every rows×reps draw
    val u = shiftright(graft.plans.expressions.md5Head60(
        concat_ws(":", lit(seed.toString),
          col("_id"), col("_rep").cast("string"))), 8)
      .cast("double") / lit(4503599627370496.0) // 2^52
    // the draw is PROJECTED once (each inverse-CDF term references u,
    // and repeated inlining would re-evaluate the md5 per term —
    // measured 49 s → 3 s on the q176 shape at sf0.1), and the
    // inverse CDF is BRANCHLESS: the weight is simply how many
    // thresholds sit at or below u — flat adds codegen far smaller
    // than a 10-deep CASE nest
    val w = PoissonCdf.map(c => when(col("_u") >= c, 1).otherwise(0))
      .reduce(_ + _)
    val repMeans = base
      .withColumn("_rep", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("_u", u)
      .withColumn("_w", w)
      .groupBy(keys :+ col("_rep"): _*)
      .agg(esum(col("_w") * col("_v")).as("_sw"), esum(col("_w")).as("_w"))
      .filter(col("_w") > 0)
      .select(keys :+ col("_rep") :+
        (col("_sw").cast("double") / col("_w").cast("double")).as("_m"): _*)
    val win = Window.partitionBy(keys: _*)
    val ranked = repMeans
      .withColumn("_rn", row_number().over(win.orderBy(col("_m"), col("_rep"))))
      .withColumn("_cnt", count(lit(1)).over(win))
    val loIdx = floor(lit(alpha / 2) * (col("_cnt") - 1)) + 1
    val hiIdx = ceil(lit(1 - alpha / 2) * (col("_cnt") - 1)) + 1
    val ci = ranked.groupBy(keys: _*)
      .agg(max(col("_cnt")).as("n_reps"),
        min(when(col("_rn") === loIdx, col("_m"))).as("lo"),
        min(when(col("_rn") === hiIdx, col("_m"))).as("hi"))
    full.join(ci, groupCols)
      .select(keys ++ Seq(col("n"), col("mean"), col("n_reps"),
        col("lo"), col("hi")): _*)
  }

  /** Per-group RIDGE regression `y ≈ b0 + b1·x1 + b2·x2` via the closed
    * normal equations — the multivariate extension of [[linearFit]] (two
    * correlated features need the cross-moment the simple fit cannot
    * see; the L2 penalty `lambda` keeps near-collinear features stable).
    * The intercept is NOT penalized (standard). One row per group:
    * `n, b0, b1, b2` (null when the 3×3 system is singular).
    *
    * Exactness: the nine moments (Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
    * Σx₁y, Σx₂y, n) accumulate in DECIMAL(38,0) over integer-valued
    * inputs; the Cramer solve is a FIXED double expression over those
    * exact sums (each 3×3 determinant expanded in one canonical
    * association), so any engine reproduces the bits.
    *
    * Scale shape: ONE hash groupBy with map-side partial aggregation —
    * the d=2 normal-equation trick that needs no per-group matrix
    * library and no second pass.
    */
  def ridgeFit(df: DataFrame, groupCols: Seq[String], x1Col: String,
               x2Col: String, yCol: String, lambda: Double): DataFrame = {
    require(groupCols.nonEmpty, "ridgeFit requires group columns")
    require(lambda >= 0, s"lambda=$lambda must be >= 0")
    val x1 = col(x1Col); val x2 = col(x2Col); val y = col(yCol)
    val sums = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        esum(x1).as("_s1"), esum(x2).as("_s2"), esum(y).as("_sy"),
        esum(x1 * x1).as("_s11"), esum(x2 * x2).as("_s22"),
        esum(x1 * x2).as("_s12"),
        esum(x1 * y).as("_s1y"), esum(x2 * y).as("_s2y"))
    val nD = col("n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val sy = col("_sy").cast("double")
    val s11 = col("_s11").cast("double") + lit(lambda)
    val s22 = col("_s22").cast("double") + lit(lambda)
    val s12 = col("_s12").cast("double")
    val s1y = col("_s1y").cast("double"); val s2y = col("_s2y").cast("double")
    // det3(a..i) = a(e*i - f*h) - b(d*i - f*g) + c(d*h - e*g), row-major
    def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
             f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(nD, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(nD, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(nD, s1, sy, s1, s11, s1y, s2, s12, s2y)
    sums.select(groupCols.map(col) ++ Seq(col("n"),
      when(det =!= 0d, det0 / det).as("b0"),
      when(det =!= 0d, det1 / det).as("b1"),
      when(det =!= 0d, det2 / det).as("b2")): _*)
  }

  /** Per-series CROSS-correlation between two integer-valued columns at
    * the given SIGNED lags: Pearson of `(x_t, y_{t−lag})` — positive
    * lags test "x follows y", negative "x leads y", lag 0 is plain
    * contemporaneous correlation; the lead–lag screen ("do purchases
    * trail clicks by two days?") that [[autocorr]] runs against a
    * series' own past. One row per (series, lag): `lag, n_pairs, ccf`
    * (null when either side is constant over the pair window).
    * `orderCol` must be unique per series. Exactness and scale shape
    * exactly as [[autocorr]]: ONE series-keyed window exchange computes
    * every lag, one grouped moment aggregation finishes.
    */
  def crossCorr(df: DataFrame, seriesCols: Seq[String], orderCol: String,
                xCol: String, yCol: String, lags: Seq[Int]): DataFrame = {
    require(seriesCols.nonEmpty, "crossCorr requires series columns")
    require(lags.nonEmpty, "crossCorr requires lags")
    val keys = seriesCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val x = col(xCol); val y = col(yCol)
    val lagged = df.filter(x.isNotNull)
      .select(keys :+ x.as("_x") :+
        array(lags.map(l =>
          struct(lit(l).as("lag"), lag(y, l).over(w).as("_py"))): _*)
          .as("_ls"): _*)
      .select(keys :+ col("_x") :+ explode(col("_ls")).as("_e"): _*)
      .select(keys :+ col("_e.lag").as("lag") :+ col("_x") :+
        col("_e._py").as("_py"): _*)
      .filter(col("_py").isNotNull)
    val sums = lagged.groupBy(keys :+ col("lag"): _*)
      .agg(momentAggs(col("_x"), col("_py")).head,
        momentAggs(col("_x"), col("_py")).tail: _*)
    covParts(sums)
      .withColumn("ccf",
        when(col("_dx") > 0d && col("_dy") > 0d,
          col("_num") / sqrt(col("_dx") * col("_dy"))))
      .select(keys ++ Seq(col("lag"), col("_n").as("n_pairs"),
        col("ccf")): _*)
  }

  /** Per-series autocorrelation at the given positive lags: Pearson of
    * `(v_t, v_{t−lag})` over the t where both exist. One row per
    * (series, lag): `lag, n_pairs, acf` (null acf when either slice is
    * constant — e.g. a flat series). `orderCol` must be unique per series
    * (aggregate to the series grain first). Values integer-valued per the
    * scaling contract.
    *
    * Scale shape: ONE series-keyed window exchange computes every lag
    * column; the per-lag pairs are exploded doc-side (|lags| × series
    * rows) into a single grouped moment aggregation.
    */
  def autocorr(df: DataFrame, seriesCols: Seq[String], orderCol: String,
               valueCol: String, lags: Seq[Int]): DataFrame = {
    require(seriesCols.nonEmpty, "autocorr requires series columns")
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val keys = seriesCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val v = col(valueCol)
    val lagged = df.filter(v.isNotNull)
      .select(keys :+ v.as("_v") :+
        array(lags.map(l =>
          struct(lit(l).as("lag"), lag(v, l).over(w).as("_pv"))): _*)
          .as("_ls"): _*)
      .select(keys :+ col("_v") :+ explode(col("_ls")).as("_e"): _*)
      .select(keys :+ col("_e.lag").as("lag") :+ col("_v") :+
        col("_e._pv").as("_pv"): _*)
      .filter(col("_pv").isNotNull)
    val sums = lagged.groupBy(keys :+ col("lag"): _*)
      .agg(momentAggs(col("_v"), col("_pv")).head,
        momentAggs(col("_v"), col("_pv")).tail: _*)
    covParts(sums)
      .withColumn("acf",
        when(col("_dx") > 0d && col("_dy") > 0d,
          col("_num") / sqrt(col("_dx") * col("_dy"))))
      .select(keys ++ Seq(col("lag"), col("_n").as("n_pairs"),
        col("acf")): _*)
  }

  /** Theil-Sen robust trend per group: the MEDIAN of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)` — the slope estimator a 29%-contaminated
    * series cannot drag where OLS ([[linearFit]]) follows every outlier.
    * Slopes are floor-scaled to integer micro-units so the median is a
    * DISCRETE order statistic (no double averaging, engine-exact); the
    * lower median is taken on even counts. The pair relation is O(d²)
    * in the per-group series length — aggregate to a bounded series
    * first (daily/hourly rollup); `maxPoints` fails loud beyond the
    * bound. Returns `(…, n_points, n_pairs, slope_micro)`.
    *
    * DUPLICATE-X CONTRACT: rows sharing an x value are collapsed by
    * SUMMING y before slopes are formed — the right reduction for count/
    * mass series (q203's daily order counts: two rows for one day ARE one
    * day's total), but NOT for repeated measurements, where 10 samples on
    * one day would become one 10× point and drag the trend. For repeated
    * measurements pre-aggregate to the mean (or median) per x yourself —
    * the operator cannot guess which reduction the series needs.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String, maxPoints: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "theilSen requires group columns")
    val keys = groupCols.map(col)
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keys :+ col(xCol).cast("long").as("_x"): _*)
      .agg(sum(col(yCol).cast("long")).as("_y")) // duplicate x's collapse
    val nRow = pts.groupBy(keys: _*).agg(count(lit(1)).as("_d"))
      .agg(max(col("_d"))).head()
    val nMax = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(nMax <= maxPoints,
      s"theilSen series length $nMax exceeds maxPoints=$maxPoints — " +
        "aggregate to a bounded series (daily/hourly rollup) first: the " +
        "pair relation is O(points²)")
    val a = pts.select(keys ++ Seq(col("_x").as("_xi"), col("_y").as("_yi")): _*)
    val b = pts.select(keys ++ Seq(col("_x").as("_xj"), col("_y").as("_yj")): _*)
    val slopes = a.join(b, groupCols).filter(col("_xi") < col("_xj"))
      .select(keys :+
        floor(lit(1000000L) * (col("_yj") - col("_yi")) /
          (col("_xj") - col("_xi"))).cast("long").as("_s"): _*)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("_s"))
    val ranked = slopes
      .withColumn("_r", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(keys: _*)))
    // integer div: Column `/` is double division and (n+1)/2 = x.5 on
    // even counts would match NO rank
    ranked.filter(col("_r") === expr("(_n + 1) div 2")) // lower median
      .groupBy(keys: _*)
      .agg(max(col("_n")).as("n_pairs"), max(col("_s")).as("slope_micro"))
      .join(pts.groupBy(keys: _*).agg(count(lit(1)).as("n_points")),
        groupCols)
      .select(keys ++ Seq(col("n_points"), col("n_pairs"),
        col("slope_micro")): _*)
  }

  /** Exact weighted discrete quantiles per group: the smallest value
    * whose CUMULATIVE weight reaches q·W — the weighted median /
    * percentile a token-weighted corpus needs (a document's influence is
    * its token count, not 1; the unweighted q34 percentile answers the
    * wrong question there). One row-scale aggregation to the
    * (group, value) domain, one ordered window for the cumulative
    * weights, then every requested q reads off the same cumulation —
    * integer weights throughout, the only double being the q·W threshold
    * (ONE fixed product, mirrored in the oracle). Returns one row per
    * (group, q): `(…, q, value, total_weight)`.
    */
  def weightedQuantile(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, weightCol: String,
                       qs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "weightedQuantile requires group columns")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs=$qs")
    val keys = groupCols.map(col)
    val v = col(valueCol); val w = col(weightCol)
    val dom = df.filter(v.isNotNull && w.isNotNull && w > 0)
      .groupBy(keys :+ v.cast("long").as("_v"): _*)
      .agg(sum(w.cast("long")).as("_w"))
    // Two-phase range-bucketed prefix sum: a per-group ordered window over
    // a large value domain is ONE task per group (the cumulation is
    // inherently sequential within its partition). Bucketing the domain by
    // the value's high bits (arithmetic shift — floor semantics, so bucket
    // order is value order, no min/max pre-pass) makes phase 1 a window
    // per (group, bucket) — parallel across buckets — and phase 2 a
    // bucket-domain-sized (≈4096× smaller) offsets window whose result
    // broadcasts back. `_cw = offset(bucket) + within-bucket prefix` is
    // the same exact integer as the single-window cumulation; `dom`'s
    // exchange is shared between the two branches at runtime.
    val bkt = shiftright(col("_v"), 12)
    val wInB = Window.partitionBy(keys :+ col("_b"): _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val part = dom.withColumn("_b", bkt)
      .withColumn("_cwb", sum(col("_w")).over(wInB))
    val wOff = Window.partitionBy(keys: _*).orderBy(col("_b"))
    // bucket totals derive from `part`, NOT dom: both branches then carry
    // the IDENTICAL (group, bucket) exchange subtree, which runtime
    // exchange reuse dedupes — an off-from-dom branch re-ran the whole
    // scan + domain aggregation (measured: two concurrent 0.3 s jobs)
    val off = part
      .groupBy(keys :+ col("_b"): _*).agg(sum(col("_w")).as("_bt"))
      .withColumn("_off",
        coalesce(sum(col("_bt")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_tw", sum(col("_bt")).over(Window.partitionBy(keys: _*)))
    val cum = part
      .join(off.select(keys ++ Seq(col("_b"), col("_off"), col("_tw")): _*),
        groupCols :+ "_b")
      .withColumn("_cw", col("_off") + col("_cwb"))
    cum
      .select(keys ++ Seq(col("_v"), col("_cw"), col("_tw"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .filter(col("_cw").cast("double") >= col("q") * col("_tw").cast("double"))
      .groupBy(keys :+ col("q"): _*)
      .agg(min(col("_v")).as("value"), max(col("_tw")).as("total_weight"))
  }

  /** Kaplan-Meier product-limit survival estimator per group — the
    * censoring-aware retention curve (q96's cohort retention counts
    * every user as observed forever; real cohorts are right-censored at
    * the observation edge, and ignoring that biases survival DOWN).
    * Input: one row per subject with an integer `durationCol` (time to
    * event or to censoring) and `eventCol` = 1 observed event / 0
    * censored. Output per (group, t in the duration domain):
    * `(…, t, n_risk, n_events, survival)` with
    * S(t) = Π_{u ≤ t} (1 − d_u / n_u).
    *
    * Determinism contract: the product runs as `exp(Σ ln(1 − d/n))` —
    * each term is one double `ln` of an exact integer ratio, the sum is
    * a domain-length window, and the result rounds to 6 dp (libm `ln`
    * may differ by an ulp between engines; the accumulated error over a
    * bounded domain is ≤ 1e-12, far inside the rounding). Full-death
    * times (d = n) zero the curve via an explicit extinct flag, never
    * via ln(0). Scale shape: one row-scale aggregation to the duration
    * domain; everything after is domain-sized windows.
    */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String],
                  durationCol: String, eventCol: String): DataFrame = {
    require(groupCols.nonEmpty, "kaplanMeier requires group columns")
    val keys = groupCols.map(col)
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(keys :+ col(durationCol).cast("long").as("_t") :+
        col(eventCol).cast("long").as("_e"): _*)
    val dom = base.groupBy(keys :+ col("_t"): _*)
      .agg(count(lit(1)).as("_m"), sum(col("_e")).as("n_events"))
    val wAll = Window.partitionBy(keys: _*)
    val wBefore = Window.partitionBy(keys: _*).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.partitionBy(keys: _*).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = dom
      .withColumn("n_risk",
        sum(col("_m")).over(wAll) -
          coalesce(sum(col("_m")).over(wBefore), lit(0L)))
      .withColumn("_term",
        when(col("n_events") === 0, lit(0d))
          .when(col("n_events") < col("n_risk"),
            log((col("n_risk") - col("n_events")).cast("double") /
              col("n_risk").cast("double")))
          .otherwise(lit(0d))) // full-death handled by the extinct flag
      .withColumn("_extinct",
        max(when(col("n_events") === col("n_risk"), 1).otherwise(0))
          .over(wIncl))
    risked
      .withColumn("survival",
        when(col("_extinct") === 1, lit(0d))
          .otherwise(round(exp(sum(col("_term")).over(wIncl)), 6)))
      .select(keys ++ Seq(col("_t").as("t"), col("n_risk"),
        col("n_events"), col("survival")): _*)
  }

  /** Isotonic (monotone non-decreasing) least-squares regression of
    * integer `yCol` on `xCol` per group — the probability-calibration
    * fit (Platt's rival; the step that turns a ranked score into a
    * calibrated P(label)). Input collapses to the DISTINCT-x domain
    * first (weights = row counts, y-sums exact integers); the fit is the
    * PAVA solution computed by its minimax CLOSED FORM
    * `fitted(i) = max_{j≤i} min_{k≥i} mean(y[j..k])` — fully relational:
    * prefix sums → all (j ≤ k) interval means → per-j suffix-min window
    * → per-i max. Every mean is ONE double division of exact integer
    * sums, so the whole fit replays verbatim in ANSI SQL (no sequential
    * pool-adjacent loop, no driver state).
    *
    * SCALE CONTRACT: the interval relation is O(d²) in the distinct-x
    * domain d — quantize x first (floor/bucket) so d stays in the
    * thousands; the contract is the same "collapse to value granularity
    * before quadratic work" posture as ksTest/mannWhitneyU, except here
    * the domain work is quadratic, so the bound matters. d is checked
    * and the call fails loud above `maxDomain`.
    *
    * Returns one row per (group, x): `(…, x, n, y_sum, fitted)` with
    * fitted non-decreasing in x within each group.
    */
  def isotonicFit(df: DataFrame, groupCols: Seq[String], xCol: String,
                  yCol: String, maxDomain: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "isotonicFit requires group columns")
    val keys = groupCols.map(col)
    val dom = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keys :+ col(xCol).cast("long").as("x"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(yCol).cast("long")).as("y_sum"))
    val dRow = dom.groupBy(keys: _*).agg(count(lit(1)).as("_d"))
      .agg(max(col("_d"))).head()
    val dMax = if (dRow.isNullAt(0)) 0L else dRow.getLong(0)
    require(dMax <= maxDomain,
      s"isotonicFit domain $dMax exceeds maxDomain=$maxDomain — quantize " +
        "xCol (floor/bucket) before fitting: the interval relation is " +
        "O(domain²)")
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("x"))
    val pre = dom.select(keys ++ Seq(col("x"), col("n"), col("y_sum"),
      sum(col("n")).over(wOrd).as("_W"),
      sum(col("y_sum")).over(wOrd).as("_S")): _*)
    // interval means m(j,k) = (S_k − S_{j−1}) / (W_k − W_{j−1}) for j ≤ k
    val j = pre.select(keys ++ Seq(col("x").as("_xj"),
      (col("_W") - col("n")).as("_Wj0"), (col("_S") - col("y_sum")).as("_Sj0")): _*)
    val k = pre.select(keys ++ Seq(col("x").as("_xk"),
      col("_W").as("_Wk"), col("_S").as("_Sk")): _*)
    val m = j.join(k, groupCols).filter(col("_xj") <= col("_xk"))
      .select(keys ++ Seq(col("_xj"), col("_xk"),
        ((col("_Sk") - col("_Sj0")).cast("double") /
          (col("_Wk") - col("_Wj0")).cast("double")).as("_m")): _*)
    // suffix min over k per (group, j): rmin(j, i) = min_{k ≥ i} m(j, k)
    val wSuf = Window.partitionBy(keys :+ col("_xj"): _*)
      .orderBy(col("_xk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rmin = m.withColumn("_rmin", min(col("_m")).over(wSuf))
    // fitted(i) = max over j ≤ i of rmin(j, i)
    val fit = rmin.groupBy(keys :+ col("_xk").as("x"): _*)
      .agg(max(col("_rmin")).as("fitted"))
    dom.join(fit, groupCols :+ "x")
      .select(keys ++ Seq(col("x"), col("n"), col("y_sum"), col("fitted")): _*)
  }

  /** Kendall's τ-b per group — rank correlation from concordant/
    * discordant pair counts with the standard tie correction: the
    * monotone-association test that, unlike Spearman ([[spearman]]),
    * degrades gracefully under heavy ties (count series, bucketed
    * values). All counts are exact integers over the pair relation;
    * τ-b = (nc − nd)/√((n0−n1)(n0−n2)) is the ONE double expression,
    * floor-scaled to micro-units (`tau_micro`; NULL when a side is
    * constant — τ undefined). x and y cast to long (floor-scale
    * currency first).
    *
    * The pair relation is O(d²) in the per-group series length —
    * aggregate to a bounded series first (daily/hourly rollup);
    * `maxPoints` fails loud beyond the bound (the [[theilSen]]
    * posture). Returns `(…, n_points, concordant, discordant, ties_x,
    * ties_y, ties_xy, tau_micro)`.
    */
  def kendallTau(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String, maxPoints: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "kendallTau requires group columns")
    val keys = groupCols.map(col)
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys ++ Seq(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y")): _*)
    val nRow = pts.groupBy(keys: _*).agg(count(lit(1)).as("_d"))
      .agg(max(col("_d"))).head()
    val nMax = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(nMax <= maxPoints,
      s"kendallTau series length $nMax exceeds maxPoints=$maxPoints — " +
        "aggregate to a bounded series (daily/hourly rollup) first: the " +
        "pair relation is O(points²)")
    // unordered pairs once: a total row order (x, y, then an md5 of the
    // pair for full determinism is unnecessary — equal (x,y) rows are
    // interchangeable for every count below, so (x,y) order suffices)
    val w = Window.partitionBy(keys: _*).orderBy(col("_x"), col("_y"))
    val rn = pts.withColumn("_rn", row_number().over(w))
    val a = rn.select(keys ++ Seq(col("_x").as("_xi"), col("_y").as("_yi"),
      col("_rn").as("_ri")): _*)
    val b = rn.select(keys ++ Seq(col("_x").as("_xj"), col("_y").as("_yj"),
      col("_rn").as("_rj")): _*)
    val pairs = a.join(b, groupCols).filter(col("_ri") < col("_rj"))
    val agg = pairs.groupBy(keys: _*).agg(
      sum(when((col("_xi") < col("_xj") && col("_yi") < col("_yj")) ||
        (col("_xi") > col("_xj") && col("_yi") > col("_yj")), 1L)
        .otherwise(0L)).as("concordant"),
      sum(when((col("_xi") < col("_xj") && col("_yi") > col("_yj")) ||
        (col("_xi") > col("_xj") && col("_yi") < col("_yj")), 1L)
        .otherwise(0L)).as("discordant"),
      sum(when(col("_xi") === col("_xj") && col("_yi") =!= col("_yj"), 1L)
        .otherwise(0L)).as("ties_x"),
      sum(when(col("_yi") === col("_yj") && col("_xi") =!= col("_xj"), 1L)
        .otherwise(0L)).as("ties_y"),
      sum(when(col("_xi") === col("_xj") && col("_yi") === col("_yj"), 1L)
        .otherwise(0L)).as("ties_xy"))
    val n = pts.groupBy(keys: _*).agg(count(lit(1)).as("n_points"))
    n.join(agg, groupCols)
      .withColumn("_n0", expr("(n_points * (n_points - 1)) div 2"))
      .withColumn("_d1", col("_n0") - col("ties_x") - col("ties_xy"))
      .withColumn("_d2", col("_n0") - col("ties_y") - col("ties_xy"))
      .select(keys ++ Seq(col("n_points"), col("concordant"),
        col("discordant"), col("ties_x"), col("ties_y"), col("ties_xy"),
        when(col("_d1") > 0 && col("_d2") > 0,
          floor(lit(1000000d) *
            (col("concordant") - col("discordant")).cast("double") /
            sqrt(col("_d1").cast("double") * col("_d2").cast("double")))
            .cast("long")).as("tau_micro")): _*)
  }

  /** Fleiss' kappa — chance-corrected agreement for m raters per unit
    * (the multi-annotator generalization of [[cohenKappa]], the standard
    * label-quality gate on crowd/ensemble-labeled training data). Input
    * is one row per (unit, rating); rater identity is irrelevant, but m
    * MUST be constant across units (the statistic is undefined
    * otherwise — fails loud). Everything is exact-integer until one
    * double expression: with S2 = Σ_u Σ_c n_uc², E = Σ_c C_c², N units,
    * m ratings each, `kappa = (A·D − B·E) / (B·(D − E))` where
    * A = S2 − Nm, B = Nm(m−1), D = (Nm)² — products in DECIMAL(38,0)
    * (N³m⁴ passes long at corpus scale). Emits the exact-integer
    * `po_ppm` (`A·10⁶ div B`, pure long arithmetic) alongside — the
    * hash-stable audit tier; pe is recoverable from po and kappa. NULL
    * kappa when Pe = 1 (all ratings one category).
    */
  def fleissKappa(df: DataFrame, unitCol: String,
                  categoryCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val cells = df.filter(col(unitCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(unitCol).as("_u"), col(categoryCol).as("_c"))
      .agg(count(lit(1)).as("_n"))
    val perUnit = cells.groupBy(col("_u"))
      .agg(sum(col("_n")).as("_m"), sum(col("_n") * col("_n")).as("_s2u"))
    val mRow = perUnit.agg(min(col("_m")), max(col("_m")),
      count(lit(1)), sum(col("_s2u"))).head()
    require(!mRow.isNullAt(0), "fleissKappa: no ratable units")
    val (mMin, mMax) = (mRow.getLong(0), mRow.getLong(1))
    require(mMin == mMax,
      s"fleissKappa requires a constant rating count per unit — saw " +
        s"m ∈ [$mMin, $mMax]; filter to complete units (e.g. first-m per " +
        "unit) before calling")
    val cat = cells.groupBy(col("_c")).agg(sum(col("_n")).as("_cc"))
      .agg(sum(col("_cc").cast(dec38) * col("_cc")).as("_e"))
    perUnit.agg(count(lit(1)).as("n_units"), max(col("_m")).as("m_raters"),
        sum(col("_s2u")).as("_s2"))
      .crossJoin(cat)
      .withColumn("_nm", col("n_units") * col("m_raters"))
      .withColumn("_aL", col("_s2") - col("_nm"))
      .withColumn("_a", col("_aL").cast(dec38))
      .withColumn("_b",
        (col("_nm") * (col("m_raters") - 1)).cast(dec38))
      .withColumn("_d", col("_nm").cast(dec38) * col("_nm"))
      .select(col("n_units"), col("m_raters"),
        expr("(_aL * 1000000) div (_nm * (m_raters - 1))").as("po_ppm"),
        when(col("_d") =!= col("_e"),
          (col("_a") * col("_d") - col("_b") * col("_e")).cast("double") /
            (col("_b") * (col("_d") - col("_e"))).cast("double"))
          .as("kappa"))
  }

  /** Benjamini-Hochberg FDR control over a family of p-values — the
    * multiple-testing gate a metrics screen needs once it runs hundreds
    * of per-segment tests (raw p < 0.05 across 1,000 tests ships ~50
    * false discoveries; BH bounds the EXPECTED false-discovery RATE at
    * `alpha`). Per test: ascending-p rank i (ties broken by the id
    * columns — deterministic on both engines), the adjusted
    * `q_value = min_{j ≥ i} p_(j)·n/j` (one ordered window for the rank,
    * one current-row-to-end window MIN — min is order-independent, so
    * the double stays engine-exact), and `significant = q ≤ alpha`.
    * Scale shape: the family is tests-sized (already aggregated), never
    * row-scale; one exchange total.
    */
  def bhFdr(df: DataFrame, idCols: Seq[String], pCol: String,
            alpha: Double): DataFrame = {
    require(idCols.nonEmpty, "bhFdr requires test-id columns")
    require(alpha > 0 && alpha < 1, s"alpha=$alpha")
    val ord = col(pCol).asc +: idCols.map(col(_).asc)
    val wRank = Window.orderBy(ord: _*)
    val wTail = Window.orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // all input columns pass through (a test family usually carries
    // statistics alongside its p-value); rank/n_tests/q_value/significant
    // append
    df.filter(col(pCol).isNotNull)
      .withColumn("rank", row_number().over(wRank))
      .withColumn("n_tests", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("q_value",
        min(col(pCol) * col("n_tests") / col("rank")).over(wTail))
      .withColumn("significant", col("q_value") <= lit(alpha))
  }
}
