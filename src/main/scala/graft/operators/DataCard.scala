package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus datasheet ("data card"): the per-segment summary a training-data
  * release ships with — sizes, token mass, exact-duplicate rate,
  * language-ID agreement, and token-length distribution per
  * (language, source) segment, computed in ONE grouped pass over the
  * corpus (plus the map-side per-doc feature projection).
  *
  * Every statistic is chosen to be ENGINE-EXACT so the whole card is
  * oracle-checkable: integer counts/sums, count-distinct over md5 content
  * keys (128-bit — no collision slack at corpus scale), interpolated
  * median matching ANSI `quantile_cont`.
  *
  * Scale shape: one shuffle keyed on the segment pair; the only
  * non-algebraic aggregate is the exact median (sort-based within group)
  * and count-distinct (two-phase distinct) — both standard grouped
  * shuffles. Nothing collects beyond the segment-count result.
  */
object DataCard {

  def summarize(docs: DataFrame, textCol: String, langCol: String,
                sourceCol: String): DataFrame = {
    val perDoc = docs.select(
      col(langCol).as("lang"),
      col(sourceCol).as("source"),
      md5(col(textCol)).as("ck"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("tok"),
      length(col(textCol)).cast("long").as("chars"),
      (TextFunctions.langId(col(textCol)) === col(langCol))
        .cast("long").as("lid_match"))
    perDoc.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("ck")).as("n_unique"),
        sum(col("tok")).as("sum_tokens"),
        sum(col("chars")).as("sum_chars"),
        sum(col("lid_match")).as("n_langid_match"),
        min(col("tok")).as("min_tok"),
        expr("percentile(tok, 0.5)").as("p50_tok"),
        max(col("tok")).as("max_tok"))
  }
}
