package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance — the warehouse pattern
  * the reference's stream→task MERGE pipeline (SCD1 overwrite,
  * `harmonize_co2_data` merge) stops one step short of: instead of
  * overwriting changed attributes, each change CLOSES the current row
  * (`valid_to` = effective date, `is_current` = false) and opens a new
  * version, preserving full history for point-in-time joins (the as-of
  * join's natural dimension shape).
  *
  * Contract: `dim` carries `(key, tracked…, valid_from DATE,
  * valid_to DATE nullable, is_current BOOLEAN)`; `updates` carries
  * `(key, tracked…)` — at most ONE row per key per batch (enforced like
  * MergeInto's dup-key guard by the caller or a pre-agg). An update row
  * whose tracked columns all equal the current version is a NO-OP (no
  * spurious version churn); a key unseen in the dimension INSERTS an
  * initial version. Decisions are exact column comparisons
  * (null-safe `<=>`), so the result is deterministic and
  * oracle-reproducible in ANSI SQL.
  *
  * Scale shape: one equi-join of updates against CURRENT rows (the
  * changed/new key relations are update-batch-sized and AQE-broadcast
  * back against the dimension), history rows stream through untouched —
  * no window, no sort, no driver state. At 100 TB-dimension scale the
  * join keys on the dimension key; with a VersionedTable dimension this
  * composes with MergeInto's exactly-once offset consume.
  */
object Scd {

  def applyBatch(dim: DataFrame, updates: DataFrame, key: String,
                 tracked: Seq[String], effectiveDate: Column): DataFrame = {
    require(tracked.nonEmpty, "need at least one tracked column")
    val cols = dim.columns.toSeq
    require(Seq("valid_from", "valid_to", "is_current").forall(cols.contains),
      s"dim must carry valid_from/valid_to/is_current, has: $cols")

    // current face of the dimension, narrowed to key + tracked
    val cur = dim.filter(col("is_current"))
      .select((key +: tracked).map(col): _*)
      .withColumnRenamed(key, "_ck")
    val curR = tracked.foldLeft(cur)((d, c) => d.withColumnRenamed(c, s"_c_$c"))

    val u = updates.join(curR, col(key) === col("_ck"), "left")
    val differs = tracked.map(c => !(col(c) <=> col(s"_c_$c"))).reduce(_ || _)
    // keys that open a new version: brand new, or changed vs current
    val opening = u.filter(col("_ck").isNull || differs)
      .select((key +: tracked).map(col): _*)
    val closingKeys = opening.select(col(key).as("_close_k"))

    // close the affected CURRENT rows; history + unaffected pass through
    val closed = dim.join(closingKeys,
        col(key) === col("_close_k") && col("is_current"), "left")
      .withColumn("valid_to",
        when(col("_close_k").isNotNull, effectiveDate.cast("date"))
          .otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("_close_k").isNotNull, lit(false))
          .otherwise(col("is_current")))
      .drop("_close_k")

    val inserts = opening
      .withColumn("valid_from", effectiveDate.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .select(cols.map(col): _*)

    closed.unionByName(inserts)
  }
}
