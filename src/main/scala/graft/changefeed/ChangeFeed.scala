package graft.changefeed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.VersionedTable

/** Spark-native emulation of a table change stream (CDC feed with a
  * consumption offset), modeled after the reference's
  * `CREATE STREAM CO2_DATA_STREAM ON TABLE CO2_DATA`
  * (/root/reference/scripts/raw data loading and stream creation/
  * 02_create_rawco2data_stream.py:50-76).
  *
  * Design: an append-only change log table. Every producer batch lands with
  * a monotonically increasing `_BATCH_ID` plus the stream pseudo-columns
  * (`METADATA\$ACTION`, `METADATA\$ISUPDATE`, `METADATA\$ROW_ID`). A consumer
  * reads `pending(consumer)` = rows with `_BATCH_ID` greater than its last
  * committed offset; committing the offset happens atomically inside the
  * consuming table's commit (see [[graft.operators.MergeInto]]), which is
  * the reference's offset-advances-on-DML-consume contract
  * (co2_harmonized_sp/function.py:119-153).
  *
  * At 100 TB: the log is partitioned parquet, pending() is a pushed-down
  * range filter on `_BATCH_ID` (partition-pruned), and nothing is ever
  * rewritten — appends only.
  */
final class ChangeFeed(spark: SparkSession, val name: String, root: String) {

  val log = VersionedTable(spark, root)

  import ChangeFeed._

  def lastBatchId: Long = log.offsets.getOrElse(PRODUCER_KEY, 0L)

  /** Producer side: record a batch of changes. Returns the batch id. */
  def publish(df: DataFrame, action: String = "INSERT",
              isUpdate: Boolean = false): Long = {
    val batchId = lastBatchId + 1
    // Opaque 128-bit row id straight off the columns — codegen'd hashes, no
    // JSON serialization in the ingest hot path. xxhash64 SKIPS null inputs
    // (the accumulator is unchanged), so per-column null flags are
    // interleaved to keep null POSITIONS distinguishing. The two 64-bit
    // halves hash the SAME column list under two distinct literal seed
    // prefixes — independently-seeded streams, not the correlated
    // forward/reversed trick (reversal preserves pairwise structure, so
    // adversarial inputs could collide both halves together).
    val cols = df.columns.toSeq.map(col)
    val flags = df.columns.toSeq.map(c => isnull(col(c)).cast("int"))
    val interleaved = cols.zip(flags).flatMap { case (c, f) => Seq(c, f) }
    def half(seed: String) = lpad(lower(hex(xxhash64(lit(seed) +: interleaved: _*))), 16, "0")
    val stamped = df
      .withColumn(ACTION, lit(action))
      .withColumn(IS_UPDATE, lit(isUpdate))
      .withColumn(ROW_ID, concat(half("graft_rowid_h1"), half("graft_rowid_h2")))
      .withColumn(BATCH_ID, lit(batchId))
    log.append(stamped, Map(PRODUCER_KEY -> batchId))
    batchId
  }

  /** Unconsumed changes for `consumer` (identified by its committed offset,
    * held in the consuming table's state).
    */
  def pending(consumedBatchId: Long): DataFrame = {
    if (!log.exists)
      throw new IllegalStateException(s"stream $name has no published batches")
    log.read.filter(col(BATCH_ID) > consumedBatchId)
  }

  /** SYSTEM\$STREAM_HAS_DATA equivalent — O(1) metadata check, no scan. */
  def hasData(consumedBatchId: Long): Boolean =
    log.exists && lastBatchId > consumedBatchId
}

object ChangeFeed {
  val ACTION    = "METADATA$ACTION"
  val IS_UPDATE = "METADATA$ISUPDATE"
  val ROW_ID    = "METADATA$ROW_ID"
  val BATCH_ID  = "_BATCH_ID"
  val PRODUCER_KEY = "_producer"

  val metaColumns: Seq[String] = Seq(ACTION, IS_UPDATE, ROW_ID, BATCH_ID)

  def apply(spark: SparkSession, name: String, root: String): ChangeFeed =
    new ChangeFeed(spark, name, root)
}
