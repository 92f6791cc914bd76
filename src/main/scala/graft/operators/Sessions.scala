package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each key's event stream into sessions at
  * inactivity gaps longer than `gapSeconds` — the canonical first step of
  * web/product analytics (funnel and retention metrics are per-session,
  * not per-event) and of behavioral training-data assembly (a "document"
  * of user activity is a session, not an unbounded history).
  *
  * Semantics: events are ordered by timestamp within each key; an event
  * opens a new session iff it is the key's first event or strictly more
  * than `gapSeconds` after the previous event. Timestamps compare in
  * WHOLE epoch seconds (`ts.cast(long)`, the q122 idiom) so the boundary
  * decision is integer-exact and reproducible in any engine — equal
  * timestamps can never straddle a boundary regardless of tie order.
  *
  * Scale shape: ONE exchange keyed on the session keys — the boundary
  * flag (`lag`) and the running session index (a framed `sum` over the
  * flags) are two window operators over the SAME partitioning+ordering,
  * so the second reuses the first's shuffle and sort. The per-key
  * partition must fit an executor, the usual per-key window contract
  * ([[OrderedLag]] §W1); for keys hotter than that, pre-split by a
  * coarse time bucket and stitch (the OrderedLag recipe).
  */
object Sessions {

  /** Input rows + `session_seq` (1-based per-key session index). */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "sessionize requires key columns")
    require(gapSeconds > 0, s"gapSeconds=$gapSeconds must be positive")
    val keys: Seq[Column] = keyCols.map(col)
    val es = col(tsCol).cast("long")
    val w = Window.partitionBy(keys: _*).orderBy(es)
    val run = Window.partitionBy(keys: _*).orderBy(es)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(es, 1).over(w)
    val isNew = when(prev.isNull || es - prev > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(run))
  }

  /** One row per session: keys, session_seq, n_events, first/last event
    * epoch-seconds and their difference. Epoch seconds, not raw
    * timestamps, so the row is engine-portable (the q122 precedent).
    */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   gapSeconds: Long): DataFrame = {
    val es = col(tsCol).cast("long")
    sessionize(df, keyCols, tsCol, gapSeconds)
      .groupBy((keyCols.map(col) :+ col("session_seq")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(es).as("t_start_s"), max(es).as("t_end_s"),
        (max(es) - min(es)).as("duration_s"))
  }
}
