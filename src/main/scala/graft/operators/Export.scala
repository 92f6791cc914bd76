package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-data export — the pipeline's LAST stage: the curated
  * corpus leaves the engine as N balanced shards plus a MANIFEST the
  * trainer's data loader verifies before consuming (shard membership,
  * row counts, CHARACTER mass — `length()`, not bytes; UTF-8 byte size
  * would differ on non-ASCII payloads — and a content checksum). No
  * reference analogue (the
  * reference's terminal stage is an analytics table); this is the
  * standard hand-off shape of LLM data pipelines (sharded dataset dirs +
  * a manifest of per-shard statistics).
  *
  * Determinism & scale:
  *  - shard assignment is `md5(seed || ':' || id) pmod nShards` — id-pure
  *    (re-runs, parallelism changes, and input reordering never move a
  *    row), engine-stable, and ANSI-SQL-reproducible, so the manifest is
  *    oracle-checkable;
  *  - ONE hash exchange on the shard key, then each shard's directory is
  *    written by its own partition (`repartition(n, shard)` +
  *    `partitionBy`) — no small-file explosion, no global sort;
  *  - the manifest checksum is an ORDER-INDEPENDENT sum (md5-prefix of
  *    the payload mod a large prime), so verification never needs a sort
  *    and distributes as a plain partial aggregate.
  */
object Export {

  private val ChecksumPrime = 1000000007L

  private def shardCol(idCol: String, seed: Long, nShards: Int) =
    pmod(conv(substring(
        md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
        1, 15), 16, 10).cast("long"),
      lit(nShards.toLong))

  /** Per-shard manifest of a relation that already carries `shard`:
    * (shard, n_rows, n_chars, checksum), checksum order-independent.
    * The checksum is a true sum-mod-prime: per-row terms reduce mod the
    * prime, the running sum accumulates in DECIMAL(38,0) (exact to 10^29
    * rows — a Long sum of ~1e9-sized terms would wrap at ~9e9 rows per
    * shard, inside the 100 TB design envelope), and the final value
    * reduces again. Exact, order-independent, ANSI-reproducible.
    */
  private def manifestOf(sharded: DataFrame, payloadCol: String): DataFrame =
    // shard cast: partition-directory read-back infers int, the write
    // side computes long — the manifest must compare equal across both
    sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col(payloadCol)).cast("long")).as("n_chars"),
        (sum((conv(substring(md5(col(payloadCol)), 1, 15), 16, 10)
            .cast("long") % ChecksumPrime)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          % ChecksumPrime).cast("long").as("checksum"))

  /** Export `df` as `nShards` shard directories under `outDir`
    * (`shard=K/` parquet, one writer partition per shard) and return the
    * manifest computed from the INPUT in the same logical pass. Pair
    * with [[verify]] over the written files: manifest equality proves
    * the hand-off is complete and uncorrupted.
    */
  def shardedExport(df: DataFrame, idCol: String, payloadCol: String,
                    seed: Long, nShards: Int, outDir: String): DataFrame = {
    require(nShards > 0, "need at least one shard")
    val sharded = df.withColumn("shard", shardCol(idCol, seed, nShards))
    sharded.repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    manifestOf(sharded, payloadCol)
  }

  /** Recompute the manifest from an export directory (the loader-side
    * integrity audit): reads only (shard, payload) thanks to column
    * pruning, aggregates partially per file.
    */
  def verify(spark: SparkSession, outDir: String,
             payloadCol: String): DataFrame =
    manifestOf(spark.read.parquet(outDir), payloadCol)
}
