package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.VersionedTable

/** Incremental materialized aggregate: a grouped COUNT/SUM table maintained
  * from the SOURCE table's commit-log deltas ([[VersionedTable.changesBetween]])
  * instead of full recomputation — the reference pipeline's
  * stream→merge→aggregate pattern generalized into one operator.
  *
  * Algebra: COUNT and SUM are abelian-group aggregates, so a delta of
  * (INSERT → +1/+x, DELETE → −1/−x) rows merges exactly: the maintained
  * table equals the from-scratch aggregate after EVERY refresh, for any
  * mix of appends, overwrites, and partition rewrites (asserted in
  * IncrementalAggSpec). Non-invertible aggregates (min/max/distinct) need
  * recompute-on-delete and are deliberately out of scope.
  *
  * Consistency: the consumed source version rides in the SAME commit as
  * the refreshed rows (the engine's exactly-once offset contract), so a
  * crash between refreshes never double-applies a delta.
  *
  * Scale shape: each refresh shuffles only the DELTA (one groupBy) and
  * joins it against the materialized table with a full-outer merge on the
  * group keys — cost tracks change volume, not table size. A 100 TB
  * source with a 1 GB daily delta refreshes in delta time.
  */
final class IncrementalAgg(spark: SparkSession, source: VersionedTable,
                           target: VersionedTable, groupCols: Seq[String],
                           sumCols: Seq[String]) {

  private val OFFSET_KEY = "incremental_agg.source_version"
  private val ACTION = "METADATA$ACTION"

  private def sign = when(col(ACTION) === "INSERT", lit(1L)).otherwise(lit(-1L))

  private def aggDelta(changes: DataFrame): DataFrame =
    changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sumCols.map(c =>
          sum(col(c) * sign).as(s"sum_$c")): _*)

  /** Applied versions are tracked in the target's offsets. */
  def appliedVersion: Long = target.offsets.getOrElse(OFFSET_KEY, 0L)

  /** Bring the materialized aggregate up to the source's latest commit.
    * Returns the number of versions applied (0 = already current).
    */
  def refresh(): Long = {
    val latest = source.state.map(_.version).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    val from = appliedVersion
    if (latest == from) return 0L
    val delta = aggDelta(source.changesBetween(from, latest))
    val valueCols = "n_rows" +: sumCols.map(c => s"sum_$c")

    // union + re-aggregate instead of a full-outer join: groups the SQL
    // join would mis-handle (NULL keys never equi-match) fold correctly
    // under GROUP BY's null-as-a-group semantics, and the plan is one
    // small shuffle over |table| + |delta| grouped rows
    val merged =
      if (!target.exists || target.state.exists(_.parts.isEmpty)) delta
      else target.read.unionByName(delta)
        .groupBy(groupCols.map(col): _*)
        .agg(sum(col(valueCols.head)).as(valueCols.head),
          valueCols.tail.map(c => sum(col(c)).as(c)): _*)
    // groups whose count returns to zero leave the table
    target.overwrite(merged.filter(col("n_rows") =!= 0L),
      Map(OFFSET_KEY -> latest))
    latest - from
  }

  /** The maintained aggregate (refresh first for freshness). */
  def read: DataFrame = target.read
}

object IncrementalAgg {
  def apply(spark: SparkSession, source: VersionedTable, targetRoot: String,
            groupCols: Seq[String], sumCols: Seq[String] = Seq.empty): IncrementalAgg =
    new IncrementalAgg(spark, source, VersionedTable(spark, targetRoot),
      groupCols, sumCols)
}
