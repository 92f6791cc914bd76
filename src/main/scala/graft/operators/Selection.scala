package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-selection operators for training-data curation: per-group
  * quantile bucketing (the CCNet head/middle/tail split, Wenzek et al.
  * 2020 §4.4) and token-budget-capped greedy selection (fill each
  * source's token quota with its best documents).
  *
  * The reference pipeline has no text surface — these are §2.11
  * LLM-pipeline extensions (X62/X63). Both are engineered so the verdicts
  * are EXACT integer decisions reproducible in ANSI SQL, which is what
  * makes their DuckDB oracles (q91/q92) hash-exact.
  *
  * Scale shapes (100 TB design point):
  *  - [[quantileBuckets]] never sorts the data. It aggregates a per-group
  *    histogram of the (integer) score — one shuffle whose row count is
  *    bounded by |groups| × |distinct scores|, NOT by the corpus — walks
  *    the cumulative counts on that tiny relation, and joins the per-group
  *    thresholds back (broadcast-sized: one row per group). The documents
  *    themselves ride ONE hash exchange, no sort. Contrast with the naive
  *    `percent_rank() OVER (PARTITION BY group ORDER BY score)` plan,
  *    which funnels every document of a group through one sorting reducer
  *    — unusable when one language is half the corpus.
  *  - [[budgetCap]] does need a per-group cumulative order, but only the
  *    NARROW key columns (group, score, tie, weight) ride the window
  *    sort; full rows are joined back by unique id afterwards (one hash
  *    exchange, no sort — the q46 lesson: text never rides a wide
  *    exchange). Skew bound = rows per group, and the greedy prefix scan
  *    is inherently sequential per group (it is the operator's contract),
  *    so the window is the honest minimal plan.
  */
object Selection {

  /** Rank of DuckDB's `quantile_disc(x, num/den)` in exact integer
    * arithmetic: the smallest 1-based rank r with r ≥ ceil(num·n/den).
    * (Verified against DuckDB: quantile_disc returns the sorted element
    * at rank ceil(q·n); IEEE `num/den` doubles land at-or-below the
    * rational, so their ceil agrees with the exact one for every n.)
    */
  private def qRank(n: Column, num: Int, den: Int): Column =
    floor((n * num + den - 1) / den)

  /** Buckets every row by per-group discrete quantile thresholds of an
    * integer score column: `names(i)` ⇔ score ≤ t(qs(i)), last name for
    * the top remainder — e.g. `qs = (1,3)::(2,3)::Nil`,
    * `names = head::middle::tail::Nil` reproduces CCNet's
    * head/middle/tail perplexity split. Quantiles are (num, den)
    * rationals so threshold ranks are exact integers; thresholds use
    * DuckDB `quantile_disc` semantics (smallest value whose cumulative
    * count reaches ceil(q·n)), making the bucketing oracle-checkable.
    *
    * Returns the input plus a `bucket` column. Ties share a bucket by
    * construction (the decision is on the score VALUE, as in CCNet —
    * thresholding, not rank-splitting), so no tie-break order is needed
    * and bucket sizes are approximate thirds, exact only on distinct
    * scores.
    */
  def quantileBuckets(df: DataFrame, groupCol: String, scoreCol: String,
                      qs: Seq[(Int, Int)], names: Seq[String]): DataFrame = {
    // per-(group, score) histogram: the only corpus-sized shuffle, and it
    // is a partial-aggregated narrow one
    val hist = df.groupBy(col(groupCol), col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_c"))
    bucketWith(df, thresholdsOf(hist, groupCol, qs), groupCol, scoreCol,
      qs, names)
  }

  /** Bucket rows by thresholds computed from an EXTERNALLY-maintained
    * per-group histogram `(group, valueCol, cntCol)` — e.g. the persisted
    * [[IncrementalQuantiles]] state — instead of scanning `df` itself:
    * the incremental face of [[quantileBuckets]], where new batches are
    * bucketed against corpus-historical thresholds without any corpus
    * rescan. Threshold semantics are identical (quantile_disc rank rule).
    */
  def bucketsFromHistogram(df: DataFrame, hist: DataFrame, groupCol: String,
                           valueCol: String, cntCol: String, scoreCol: String,
                           qs: Seq[(Int, Int)], names: Seq[String]): DataFrame = {
    val h = hist.select(col(groupCol), col(valueCol).as("_s"),
      col(cntCol).as("_c"))
    bucketWith(df, thresholdsOf(h, groupCol, qs), groupCol, scoreCol,
      qs, names)
  }

  /** One row per group: `_t0.._tk` threshold scores at each requested
    * rational quantile, from a `(group, _s, _c)` histogram relation.
    */
  private def thresholdsOf(hist: DataFrame, groupCol: String,
                           qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.forall { case (n, d) => n > 0 && n < d }, "cuts in (0,1)")
    val g = col(groupCol)
    val wCum = Window.partitionBy(g).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val tCols = qs.zipWithIndex.map { case ((num, den), i) =>
      min(when(col("_cum") >= qRank(col("_n"), num, den), col("_s")))
        .as(s"_t$i")
    }
    cum.groupBy(g).agg(tCols.head, tCols.tail: _*)
  }

  private def bucketWith(df: DataFrame, thresholds: DataFrame,
                         groupCol: String, scoreCol: String,
                         qs: Seq[(Int, Int)], names: Seq[String]): DataFrame = {
    require(names.length == qs.length + 1, "need one more name than cut")
    val bucket = qs.indices.foldRight(lit(names.last): Column) { (i, acc) =>
      when(col(scoreCol) <= col(s"_t$i"), lit(names(i))).otherwise(acc)
    }
    df.join(thresholds, groupCol) // broadcast: one row per group
      .withColumn("bucket", bucket)
      .drop(qs.indices.map(i => s"_t$i"): _*)
  }

  /** Greedy token-budget selection: within each group, rows in
    * (priority DESC, tie ASC) order are kept while the running sum of
    * `weightCol` stays ≤ `budget` — the "fill each domain's token quota
    * with its highest-quality documents first" curation step. `tieCol`
    * must be unique (it is also the join-back key); the decision is an
    * exact integer comparison on a deterministic total order, so the
    * kept set is reproducible anywhere.
    *
    * Returns the kept rows of `df` plus `_cum` (the running total after
    * including the row). Only (group, priority, tie, weight) ride the
    * window sort; full rows join back by the unique tie key.
    */
  def budgetCap(df: DataFrame, groupCol: String, priorityCol: String,
                tieCol: String, weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(priorityCol).desc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = df.select(col(groupCol), col(priorityCol), col(tieCol),
        col(weightCol))
      .withColumn("_cum", sum(col(weightCol)).over(w))
      .filter(col("_cum") <= budget)
      .select(col(tieCol), col("_cum"))
    df.join(kept, Seq(tieCol)) // unique-key equi-join, no sort
  }

  /** 2-D Pareto frontier (skyline), both dimensions MAXIMIZED — the
    * "best quality at every cost level" selection (quality vs length,
    * score vs recency). A row survives iff NO other row is ≥ in both
    * dimensions and > in at least one; exact duplicates of a frontier
    * point all survive (neither strictly improves the other).
    *
    * The input is first collapsed to the (x, max y) DOMAIN with an
    * ordinary hash aggregation — only that pair decides the skyline —
    * and the global window runs over the collapsed relation: a domain
    * point is on the frontier iff its max-y strictly exceeds the running
    * max-y of every strictly-greater x. Survivor rows come back via a
    * semi-join on (x, y). O(n) shuffle + O(|x-domain| log) sort — never
    * the O(n²) dominance join, which is what the oracle runs to prove
    * this plan right.
    *
    * Scale note: an unpartitioned window is AllTuples — Spark moves its
    * whole input to ONE partition. That is exactly why the window here
    * runs AFTER the groupBy(x) collapse: the single-partition buffer
    * holds the x-domain (bounded by the integer-scaling contract), not
    * the row-scale input, and the row-scale work is all hash-partitioned
    * (the aggregate and the semi-join, whose frontier side AQE
    * broadcasts).
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val base = df.filter(x.isNotNull && y.isNotNull)
    val dom = base.groupBy(x.as("_px")).agg(max(y).as("_py"))
    // x values are distinct after the collapse, so a rows-frame is the
    // strictly-greater-x range frame
    val maxYRight = max(col("_py")).over(Window.orderBy(col("_px").desc)
      .rowsBetween(Window.unboundedPreceding, -1))
    val front = dom.withColumn("_mr", maxYRight)
      .filter(col("_mr").isNull || col("_py") > col("_mr"))
      .select(col("_px"), col("_py"))
    base.join(front, x === col("_px") && y === col("_py"), "left_semi")
  }
}
