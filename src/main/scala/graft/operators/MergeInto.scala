package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.VersionedTable

/** Join-based MERGE (upsert) into a [[VersionedTable]] — the Spark-native
  * re-expression of the reference's Snowpark
  * `target.merge(source, cond, [when_matched.update, when_not_matched.insert])`
  * (/root/reference/udfs_and_spoc/co2_harmonized_sp/co2_harmonized_sp/
  * function.py:146-153).
  *
  * Semantics preserved:
  *  - equi-join on `keys`; matched rows take source values, unmatched target
  *    rows are kept, unmatched source rows are inserted (the reference's
  *    single update + single insert clause, both mapping all columns);
  *  - duplicate source keys raise (Snowflake errors on nondeterministic
  *    multi-match updates) unless `dedupeSource` picks a deterministic row;
  *  - the consuming stream's offset commits in the SAME table commit as the
  *    merged data — exactly-once consume.
  *
  * Scale: one shuffle on the merge keys (Catalyst picks broadcast for small
  * sources automatically); output rewrite is a full snapshot here — a
  * partition-scoped overwrite (`replaceWhere`-style) is the 100 TB upgrade
  * path and slots into the same commit protocol.
  */
object MergeInto {

  final case class MergeResult(updated: Long, inserted: Long, version: Long)

  /** The merge as a pure plan: full-outer join on `keys`, matched rows take
    * source values, unmatched keep target — no write. Shared by the table
    * writer below and usable directly as a query operator.
    */
  def mergedPlan(target: DataFrame, source: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val joined = joinedPlan(target, source, keys)
    joined.select(
      target.columns.toSeq.map { c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
      }: _*)
  }

  private def joinedPlan(target: DataFrame, source: DataFrame,
                         keys: Seq[String]): DataFrame = {
    val cond: Column =
      keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    target.as("t").join(source.as("s"), cond, "full_outer")
  }

  def apply(
      spark: SparkSession,
      target: VersionedTable,
      source: DataFrame,
      keys: Seq[String],
      consumeOffsets: Map[String, Long] = Map.empty,
      dedupeSource: Boolean = false
  ): MergeResult = {
    require(keys.nonEmpty, "merge requires at least one key column")

    val srcCols = source.columns.toSeq
    val src0 = if (dedupeSource) {
      // deterministic survivor per key: max over all non-key columns' struct
      val nonKey = srcCols.filterNot(keys.contains)
      source.groupBy(keys.map(col): _*)
        .agg(max(struct(nonKey.map(col): _*)).as("_s"))
        .select(keys.map(col) ++ nonKey.map(c => col(s"_s.$c").as(c)): _*)
        .select(srcCols.map(col): _*)
    } else {
      val dups = source.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
      if (!dups.isEmpty)
        throw new IllegalArgumentException(
          s"duplicate source keys for merge on ${keys.mkString(",")} " +
            "(Snowflake raises on nondeterministic MERGE); pass dedupeSource=true")
      source
    }

    if (!target.exists) {
      val v = target.overwrite(src0, consumeOffsets)
      return MergeResult(0L, src0.count(), v)
    }

    val tgt = target.read
    require(tgt.columns.sorted.sameElements(src0.columns.sorted),
      s"merge schema mismatch: target ${tgt.columns.mkString(",")} vs source ${src0.columns.mkString(",")}")

    // merged rows + update/insert counters in ONE pass: flag columns ride
    // the plan and an Observation collects their sums during the write job
    // itself (no second execution of the join for counting).
    val joined = joinedPlan(tgt, src0, keys)
    val sKey = col(s"s.${keys.head}"); val tKey = col(s"t.${keys.head}")
    val flagged = joined.select(
      tgt.columns.toSeq.map(c => coalesce(col(s"s.$c"), col(s"t.$c")).as(c)) ++ Seq(
        when(sKey.isNotNull && tKey.isNotNull, 1L).otherwise(0L).as("_merge_upd"),
        when(sKey.isNotNull && tKey.isNull, 1L).otherwise(0L).as("_merge_ins")): _*)
    val obs = new org.apache.spark.sql.Observation()
    val observed = flagged
      .observe(obs, sum(col("_merge_upd")).as("upd"), sum(col("_merge_ins")).as("ins"))
      .drop("_merge_upd", "_merge_ins")

    val v = target.overwrite(observed, consumeOffsets)
    val metrics = obs.get
    def cnt(k: String) = Option(metrics(k)).map(_.asInstanceOf[Long]).getOrElse(0L)
    MergeResult(cnt("upd"), cnt("ins"), v)
  }
}
