package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.storage.VersionedTable

/** Delta-maintained corpus data card (the incremental sibling of
  * [[DataCard.summarize]]): the per-(lang, source) release datasheet kept
  * current from a versioned corpus's commit log, so the card costs delta
  * time per refresh — the corpus is NEVER rescanned — yet every statistic
  * stays ENGINE-EXACT, including under deletes.
  *
  * Three state relations, all folded from ONE delta scan per refresh:
  *   - scalar sums `(lang, source, n_docs, sum_tokens, sum_chars,
  *     n_langid_match)` — abelian (+ on INSERT, − on DELETE);
  *   - content-key multiset `(lang, source, ck, cnt)` with 128-bit md5
  *     keys — signed counts make COUNT(DISTINCT content) exact under
  *     deletes (rows with cnt = 0 drop out; a sketch could never
  *     unmerge);
  *   - token-count histogram `(lang, source, tok, cnt)` (the X55
  *     machinery) — min/max/INTERPOLATED median read off cumulative
  *     counts, matching ANSI `percentile`/`quantile_cont` exactly
  *     because both order statistics around the midpoint are recovered
  *     from the histogram.
  *
  * Exactly-once: the consumed source version rides the same commit as
  * each refreshed state table (offsets-in-commit), so crash replays
  * cannot double-count a delta.
  *
  * Scale shape: each refresh is batch-sized map-side-partial groupBys
  * folded into state bounded by segments (+ distinct contents for the ck
  * multiset — the same corpus-keyed state every exact dedup index
  * carries); [[card]] is state-sized — two windows over the histogram,
  * one count over the multiset, one join, nothing touches the corpus.
  */
final class IncrementalDataCard(spark: SparkSession, source: VersionedTable,
                                stateRoot: String, textCol: String,
                                langCol: String, sourceCol: String) {

  private val OFFSET_KEY = "incremental_card.source_version"
  private val ACTION = "METADATA$ACTION"

  private def aggT = VersionedTable(spark, s"$stateRoot/agg", collectStats = false)
  private def ckT = VersionedTable(spark, s"$stateRoot/ck", collectStats = false)
  private def tokT = VersionedTable(spark, s"$stateRoot/tok", collectStats = false)

  def appliedVersion: Long = aggT.offsets.getOrElse(OFFSET_KEY, 0L)

  /** The same per-doc feature projection as the batch card, plus the
    * delta sign (+1 INSERT / −1 DELETE).
    */
  private def perDoc(rows: DataFrame): DataFrame = rows.select(
    col(langCol).as("lang"),
    col(sourceCol).as("source"),
    md5(col(textCol)).as("ck"),
    TextFunctions.tokenCount(col(textCol)).cast("long").as("tok"),
    length(col(textCol)).cast("long").as("chars"),
    (TextFunctions.langId(col(textCol)) === col(langCol))
      .cast("long").as("lid_match"),
    when(col(ACTION) === "DELETE", -1L).otherwise(1L).as("sgn"))

  /** Bring all three state relations up to the source's latest commit;
    * returns the number of source versions applied (0 = current).
    */
  def refresh(): Long = {
    val latest = source.state.map(_.version).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    val from = appliedVersion
    if (latest == from) return 0L
    val changes = source.changesBetween(from, latest)
    val signed = perDoc(changes)
      .localCheckpoint(true) // one delta scan feeds three folds

    def fold(state: VersionedTable, delta: DataFrame, keys: Seq[String],
             sums: Seq[String]): Unit = {
      val merged =
        if (!state.exists || state.state.exists(_.parts.isEmpty)) delta
        else state.read.unionByName(delta)
      val folded = merged.groupBy(keys.map(col): _*)
        .agg(sum(col(sums.head)).cast("long").as(sums.head),
          sums.tail.map(c => sum(col(c)).cast("long").as(c)): _*)
      state.overwrite(
        if (sums == Seq("cnt")) folded.filter(col("cnt") =!= 0L) else folded,
        Map(OFFSET_KEY -> latest))
    }

    fold(aggT,
      signed.groupBy(col("lang"), col("source")).agg(
        sum(col("sgn")).cast("long").as("n_docs"),
        sum(col("sgn") * col("tok")).cast("long").as("sum_tokens"),
        sum(col("sgn") * col("chars")).cast("long").as("sum_chars"),
        sum(col("sgn") * col("lid_match")).cast("long").as("n_langid_match")),
      Seq("lang", "source"),
      Seq("n_docs", "sum_tokens", "sum_chars", "n_langid_match"))
    fold(ckT,
      signed.groupBy(col("lang"), col("source"), col("ck"))
        .agg(sum(col("sgn")).cast("long").as("cnt")),
      Seq("lang", "source", "ck"), Seq("cnt"))
    fold(tokT,
      signed.groupBy(col("lang"), col("source"), col("tok"))
        .agg(sum(col("sgn")).cast("long").as("cnt")),
      Seq("lang", "source", "tok"), Seq("cnt"))
    latest - from
  }

  /** The datasheet, read from state only — IDENTICAL schema and values to
    * [[DataCard.summarize]] over the net corpus. The interpolated median
    * comes from the two order statistics at positions
    * floor/ceil((n−1)/2)+1 of the cumulative histogram — exactly ANSI
    * `percentile(tok, 0.5)` / `quantile_cont(tok, 0.5)`.
    */
  def card: DataFrame = {
    val uniq = ckT.read.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_unique"))
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("lang"), col("source"))
    val cum = tokT.read
      .withColumn("_cum", sum(col("cnt")).over(w))
      .withColumn("_n", sum(col("cnt")).over(wAll))
      .withColumn("_k1", floor((col("_n") - 1) / 2) + 1)
      .withColumn("_k2", ceil((col("_n") - 1) / 2) + 1)
    val tokStats = cum.groupBy(col("lang"), col("source")).agg(
      min(col("tok")).as("min_tok"),
      ((min(when(col("_cum") >= col("_k1"), col("tok"))) +
        min(when(col("_cum") >= col("_k2"), col("tok")))) / 2.0)
        .as("p50_tok"),
      max(col("tok")).as("max_tok"))
    aggT.read
      .join(uniq, Seq("lang", "source"))
      .join(tokStats, Seq("lang", "source"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_unique"),
        col("sum_tokens"), col("sum_chars"), col("n_langid_match"),
        col("min_tok"), col("p50_tok"), col("max_tok"))
  }
}

object IncrementalDataCard {
  def apply(spark: SparkSession, source: VersionedTable, stateRoot: String,
            textCol: String, langCol: String, sourceCol: String)
      : IncrementalDataCard =
    new IncrementalDataCard(spark, source, stateRoot, textCol, langCol,
      sourceCol)
}
