package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch prep: assign every document a
  * sequence number such that sequences fill to a token budget
  * (contiguous-fill packing — the standard "concat then split at
  * max_len" layout, where a document may straddle a sequence boundary).
  *
  * The assignment is a pure function of (group, order, token counts):
  * a running token total per group (one window shuffle), then
  * `seq_no = floor(tokens_before_this_doc / maxTokens)` — deterministic,
  * engine-independent, and expressible in ANSI SQL, so it oracle-checks
  * exactly. At 100 TB the window is ONE hash exchange keyed on the group
  * column; choose groups (language, shard id) so each stays
  * executor-sized — the downstream trainer reads one group per worker
  * anyway. No driver state, no collect.
  */
object Packing {

  /** Add `seq_no` (0-based) packing each group's documents, in `orderCol`
    * order, into sequences of `maxTokens` tokens. `tokenCol` must be a
    * non-negative integer column; a document larger than `maxTokens`
    * still starts in the sequence where its first token lands (it spills
    * into following sequences, as concat-then-split training data does).
    */
  def packSequences(df: DataFrame, tokenCol: String, groupCol: String,
                    orderCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      // tokens before this doc = cum - own; exact for totals < 2^53
      .withColumn("seq_no",
        floor((col("_cum") - col(tokenCol)) / maxTokens).cast("long"))
      .drop("_cum")
  }

  /** Per-sequence occupancy summary — the packing-quality view a data
    * engineer actually looks at (docs per sequence, fill level).
    */
  def packingSummary(df: DataFrame, tokenCol: String, groupCol: String,
                     orderCol: String, maxTokens: Int): DataFrame =
    packSequences(df, tokenCol, groupCol, orderCol, maxTokens)
      .groupBy(col(groupCol), col("seq_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))

  /** Materialize the packed TRAINING SEQUENCES themselves: one row per
    * (group, seq_no) with member documents joined in order by `sep`
    * (the EOS/document-separator token). `array_agg` + `sort_array` +
    * deterministic struct ordering keeps the concatenation order exact
    * and engine-reproducible — same one window shuffle + one aggregation
    * as the summary, so the physical step adds no new exchange.
    */
  def materializeSequences(df: DataFrame, textCol: String, tokenCol: String,
                           groupCol: String, orderCol: String,
                           maxTokens: Int, sep: String): DataFrame =
    packSequences(df, tokenCol, groupCol, orderCol, maxTokens)
      .groupBy(col(groupCol), col("seq_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(orderCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("sequence_text"))
}
