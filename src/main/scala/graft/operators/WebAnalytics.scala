package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-corpus analytics over URL structure and source composition —
  * the dashboards a web-scale ingestion pipeline watches between crawls.
  */
object WebAnalytics {

  /** URL path-tree rollup: every URL contributes one row per ancestor
    * prefix up to `maxDepth` (`/a/b/c` → `/a`, `/a/b`, `/a/b/c`), and
    * each prefix aggregates its URL count and DISTINCT immediate
    * children — the "where is this crawl fat" tree profile. Input is a
    * PATH column (`/seg/seg/…`); pair with `parse_url(url, 'PATH')`
    * upstream. Output: `(prefix, depth, n_urls, n_children)` where
    * n_children counts distinct next segments below the prefix (0 at
    * leaves).
    *
    * Scale shape: one codegen'd split + a sequence-explode Generate
    * (≤ maxDepth rows per URL — bounded fanout, no interpreted array
    * lambdas), then one hash aggregation on the prefix domain.
    */
  def pathTreeRollup(df: DataFrame, pathCol: String,
                     maxDepth: Int = 8): DataFrame = {
    require(maxDepth >= 1, s"maxDepth=$maxDepth")
    val parts = split(col(pathCol), "/") // leading "" for the root slash
    val depth = size(parts) - 1
    df.filter(col(pathCol).isNotNull && col(pathCol).startsWith("/") &&
        depth >= 1)
      .select(parts.as("_p"), depth.as("_d"),
        explode(sequence(lit(1), least(depth, lit(maxDepth)))).as("depth"))
      .select(col("depth"),
        concat(lit("/"),
          array_join(slice(col("_p"), lit(2), col("depth")), "/")).as("prefix"),
        // the immediate child segment below this prefix (null at leaves)
        when(col("_d") > col("depth"),
          element_at(col("_p"), col("depth") + 2)).as("_child"))
      .groupBy(col("prefix"), col("depth"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("_child")).as("n_children"))
  }

  /** Unigram-distribution divergence between corpus sources: for every
    * ordered source pair (a ≠ b), the add-one-smoothed KL divergence
    * `Σ_t p(t)·ln(p(t)/q(t))` over the UNION vocabulary (smoothing gives
    * both sides mass everywhere, so KL is finite and every vocab term
    * contributes) plus the cross-entropy `−Σ p ln q` — the
    * which-sources-drift dashboard for corpus-mixture maintenance.
    *
    * Determinism: probabilities are ratios of exact integer counts; the
    * per-term `ln` is the only double and the sum rounds to 6 dp
    * (libm-ulp-proof over a bounded vocabulary). Scale shape: the corpus
    * collapses to (source, token) counts before anything pairs; the
    * pair grid is |vocab| × |sources|² — vocabulary- and
    * source-domain-sized, never token-occurrence-sized.
    */
  def corpusDivergence(df: DataFrame, sourceCol: String,
                       textCol: String): DataFrame = {
    val toks = df
      .filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("src"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy(col("src"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val vocab = counts.select(col("tok")).distinct()
    val vSize = vocab.agg(count(lit(1))).head().getLong(0)
    val srcs = totals.select(col("src"), col("tot"))
    val grid = vocab
      .crossJoin(broadcast(srcs.select(col("src").as("src_a"),
        col("tot").as("tot_a"))))
      .crossJoin(broadcast(srcs.select(col("src").as("src_b"),
        col("tot").as("tot_b"))))
      .filter(col("src_a") =!= col("src_b"))
      .join(counts.select(col("src").as("src_a"), col("tok"),
        col("c").as("ca")), Seq("src_a", "tok"), "left")
      .join(counts.select(col("src").as("src_b"), col("tok"),
        col("c").as("cb")), Seq("src_b", "tok"), "left")
    val p = (coalesce(col("ca"), lit(0L)) + lit(1L)).cast("double") /
      (col("tot_a") + lit(vSize)).cast("double")
    val q = (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
      (col("tot_b") + lit(vSize)).cast("double")
    grid
      .select(col("src_a"), col("src_b"),
        (p * log(p / q)).as("_klt"), (-p * log(q)).as("_cet"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(lit(vSize).as("n_terms"),
        round(sum(col("_klt")), 6).as("kl"),
        round(sum(col("_cet")), 6).as("cross_entropy"))
  }
}
