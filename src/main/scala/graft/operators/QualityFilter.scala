package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality gate — the C4 / Gopher heuristic filter
  * chain (Raffel et al. 2020 §2.2; Rae et al. 2021 appendix A1.1) that
  * fronts every published pretraining-data pipeline: cheap, deterministic
  * per-document predicates that cut boilerplate, machine-generated spam,
  * and format noise BEFORE the expensive dedup / model-scoring stages run.
  *
  * The reference pipeline has no text surface (numeric CO2 only) — this is
  * part of the engine's §2.11 LLM-pipeline extension (X53).
  *
  * Every rule is an INTEGER comparison (`10·hits ≤ k·n` instead of
  * `hits/n ≤ k/10`): token counts and character counts are exact longs, so
  * the verdicts carry zero float risk and reproduce bit-identically in any
  * ANSI engine — which is what makes the DuckDB oracle (q83) exact.
  *
  * Rules (names are the `reasons` vocabulary, alphabetical in output):
  *  - `alpha_ratio`     — ≥ minAlphaPerTen/10 of tokens contain a letter
  *  - `bullet_lines`    — ≤ maxBulletPerTen/10 of lines start with -, * or •
  *  - `ellipsis_lines`  — ≤ maxEllipsisPerTen/10 of lines end with "..."
  *  - `mean_word_len`   — mean token length in [minMeanWordLen, maxMeanWordLen]
  *  - `stopword_hits`   — ≥ minStopwordHits tokens from a small English stoplist
  *  - `symbol_ratio`    — (# count + "..." count) ≤ maxSymbolPerTen/10 per token
  *  - `word_count`      — token count in [minWords, maxWords]
  * Blank/NULL text fails `word_count` and no other rule fires (n = 0 guards).
  *
  * Scale shape: ONE projection pass, pure `functions._` (whole-stage
  * codegen, no UDF, no shuffle, no join) — at 100 TB this is a map-only
  * stage that fuses into the scan, and the survivors feed the downstream
  * dedup stages without materializing.
  */
object QualityFilter {

  /** Thresholds; the *PerTen knobs are numerators over 10 so every rule
    * stays an exact integer comparison.
    */
  final case class Config(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Int = 3, maxMeanWordLen: Int = 10,
      minAlphaPerTen: Int = 8, maxSymbolPerTen: Int = 1,
      maxBulletPerTen: Int = 9, maxEllipsisPerTen: Int = 3,
      minStopwordHits: Int = 2) {
    require(minWords >= 1 && maxWords >= minWords, "bad word-count bounds")
    require(Seq(minAlphaPerTen, maxSymbolPerTen, maxBulletPerTen,
      maxEllipsisPerTen).forall(k => k >= 0 && k <= 10), "perTen knobs in 0..10")
  }

  /** Stoplist shared verbatim with the oracle SQL — keep tiny and frozen. */
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "a", "is", "for", "on", "that")

  /** Per-document rule verdicts: input columns + one `ok_<rule>` boolean per
    * rule + `passed` (AND of all) + `reasons` (comma-joined failed rule
    * names, alphabetical, "" when passed).
    */
  def flags(df: DataFrame, textCol: String, cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    val toks = split(lower(trim(text)), "\\s+")
    // split("") yields [""] — count blank text as zero tokens
    val n = when(text.isNull || length(trim(text)) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))
    val sumLen = coalesce(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)), lit(0L))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    val nHash = (length(text) - length(replace(text, lit("#"), lit("")))).cast("long")
    val nEllipsis =
      ((length(text) - length(replace(text, lit("..."), lit("")))) / 3).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => trim(l).rlike("^[-*•]"))).cast("long")
    val nEllLines = size(filter(lines,
      l => trim(l).rlike("\\.\\.\\.$"))).cast("long")

    // n = 0 ⇒ only word_count fires (every ratio rule vacuously passes)
    def ifAny(ok: Column): Column = n === 0L || ok

    df.withColumn("_n", n)
      .withColumn("ok_alpha_ratio",
        ifAny(nAlpha * 10 >= col("_n") * cfg.minAlphaPerTen))
      .withColumn("ok_bullet_lines",
        ifAny(nBullet * 10 <= nLines * cfg.maxBulletPerTen))
      .withColumn("ok_ellipsis_lines",
        ifAny(nEllLines * 10 <= nLines * cfg.maxEllipsisPerTen))
      .withColumn("ok_mean_word_len",
        ifAny(sumLen >= col("_n") * cfg.minMeanWordLen &&
          sumLen <= col("_n") * cfg.maxMeanWordLen))
      .withColumn("ok_stopword_hits", ifAny(nStop >= cfg.minStopwordHits))
      .withColumn("ok_symbol_ratio",
        ifAny((nHash + nEllipsis) * 10 <= col("_n") * cfg.maxSymbolPerTen))
      .withColumn("ok_word_count",
        col("_n") >= cfg.minWords && col("_n") <= cfg.maxWords)
      .withColumn("passed",
        col("ok_alpha_ratio") && col("ok_bullet_lines") &&
          col("ok_ellipsis_lines") && col("ok_mean_word_len") &&
          col("ok_stopword_hits") && col("ok_symbol_ratio") &&
          col("ok_word_count"))
      .withColumn("reasons", concat_ws(",",
        when(!col("ok_alpha_ratio"), "alpha_ratio"),
        when(!col("ok_bullet_lines"), "bullet_lines"),
        when(!col("ok_ellipsis_lines"), "ellipsis_lines"),
        when(!col("ok_mean_word_len"), "mean_word_len"),
        when(!col("ok_stopword_hits"), "stopword_hits"),
        when(!col("ok_symbol_ratio"), "symbol_ratio"),
        when(!col("ok_word_count"), "word_count")))
      .drop("_n")
  }

  /** Survivors only, original schema — the composable pipeline stage. */
  def keep(df: DataFrame, textCol: String, cfg: Config = Config()): DataFrame = {
    val flagged = flags(df, textCol, cfg)
    flagged.filter(col("passed")).select(df.columns.map(col): _*)
  }
}
