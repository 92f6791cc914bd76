package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational form of content-defined chunking
  * ([[graft.functions.TextFunctions.chunkContentDefined]] is the
  * array-valued Column form; THIS is the one to run over a corpus):
  * token explode → one md5 per gap (lead window) → prefix-sum chunk ids
  * → per-chunk ordered reassembly. Identical boundaries by
  * construction (same gap hash, same prefix count) — pinned by a
  * ChunkingSpec parity test.
  *
  * Why two forms: Spark's higher-order array functions are INTERPRETED
  * (no codegen), so the array form pays per-element lambda dispatch —
  * measured 37.7 s for the q184 corpus where this relational plan runs
  * in ~2 s. The array form remains for row-local composition (chunk
  * inside a larger projection); corpus-scale chunking goes through
  * here.
  *
  * Scale shape: the exploded relation is corpus-token-sized but only
  * (keys, pos, token) wide; both windows and the final grouped
  * reassembly ride ONE doc-keyed exchange. Per-doc rows must fit a
  * window buffer (docs, not corpora — the §W1 contract).
  */
object CdcChunk {

  /** One row per (keys, chunk_id) with the reassembled `chunk` and its
    * `n_tokens`. `avgTokens` is the expected chunk length (boundary at
    * gap hash ≡ 0 mod avgTokens).
    */
  def chunks(df: DataFrame, keyCols: Seq[String], textCol: String,
             avgTokens: Int): DataFrame = {
    require(keyCols.nonEmpty, "chunks requires key columns")
    require(avgTokens >= 2, s"avgTokens=$avgTokens must be >= 2")
    val keys = keyCols.map(col)
    val toks = df.filter(col(textCol).isNotNull)
      .select(keys :+ posexplode(split(trim(col(textCol)), "\\s+"))
        .as(Seq("_i", "_tok")): _*)
    val wd = Window.partitionBy(keys: _*).orderBy(col("_i"))
    val nxt = lead(col("_tok"), 1).over(wd)
    val flag = when(nxt.isNotNull &&
        conv(substring(md5(concat_ws(":", col("_tok"), nxt)), 1, 13),
          16, 10).cast("long") % avgTokens === 0, 1L)
      .otherwise(0L)
    toks.withColumn("_f", flag)
      .withColumn("chunk_id",
        coalesce(sum(col("_f"))
          .over(wd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("int"))
      .groupBy(keys :+ col("chunk_id"): _*)
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("_i"), col("_tok")))),
          x => x.getField("_tok"))).as("chunk"))
  }
}
