package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight shuffle diagnostics — the checks a 100 TB job runs BEFORE
  * committing to a shuffle plan, answered from domain-sized aggregates
  * instead of discovering the problem as a dead executor three hours in:
  *
  *   - [[skewReport]]: is this groupBy/join key skewed, and what salt
  *     factor would bound the heaviest reducer? (AQE's skew-join handles
  *     sort-merge joins at runtime; aggregations and custom-partitioned
  *     pipelines still need the salt decided up front.)
  *   - [[joinCardinality]]: EXACT output row count of an equi-join
  *     computed without executing it — Σ over matching keys of
  *     |L_k|·|R_k| — the explosion guard for joins whose keys are
  *     non-unique on both sides (the Σc² self-join trap).
  *
  * Both collapse the input to per-key counts first (one map-side-combined
  * aggregation each; output is key-DOMAIN-sized), so the diagnostic
  * itself can never be the thing that explodes.
  */
object Diagnostics {

  /** One-row skew summary of `df` grouped by `keyCols`:
    * `(n_rows, n_keys, max_key_rows, p50_key_rows, p99_key_rows,
    * skew_ratio, suggested_salt)` where skew_ratio = max/avg rows per
    * key and suggested_salt = ceil(max_key_rows / targetRowsPerKey)
    * (1 = no salting needed). Percentiles are exact (computed on the
    * key-count relation, which is domain-sized by construction).
    */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 targetRowsPerKey: Long = 1000000L): DataFrame = {
    require(targetRowsPerKey >= 1, s"targetRowsPerKey=$targetRowsPerKey")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
    counts.agg(
        sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("_c")).as("max_key_rows"),
        expr("percentile(_c, 0.5)").as("p50_key_rows"),
        expr("percentile(_c, 0.99)").as("p99_key_rows"))
      // ONE fixed double expression (max·keys/rows), association mirrored
      // in the oracle — the scaled-statistics reproducibility contract
      .withColumn("skew_ratio",
        col("max_key_rows").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"))
      .withColumn("suggested_salt", // integer ceil-div (`div`, not `/`:
        // Column `/` is double division and would round at 2^53)
        expr(s"(max_key_rows + ${targetRowsPerKey - 1}) div $targetRowsPerKey"))
  }

  /** The `n` heaviest keys as `(key cols…, key_rows)` — the candidates a
    * salting or broadcast-isolation decision actually needs to see.
    */
  def topHeavyKeys(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("key_rows"))
      .orderBy(desc("key_rows") +: keyCols.map(col): _*)
      .limit(n)

  /** Order-independent per-bucket reconciliation fingerprint — the
    * source-vs-sink validation an incremental pipeline runs after every
    * sync (row counts alone miss value corruption; full sort-compare
    * doesn't scale). The bucket comes from the KEY columns' digest and
    * the checksum from the FULL row digest
    * (`md5(concat_ws(0x1, cols…))` each — the 0x1 separator keeps
    * `("ab","c")` and `("a","bc")` distinct; concat_ws SKIPS null
    * columns, so null and absent collide — acceptable for a
    * fingerprint, documented): a corrupted VALUE therefore stays in its
    * key's bucket, where it shows as same-count/different-checksum —
    * the mismatch localizes to 1/`buckets` of the KEY space instead of
    * "somewhere" (bucketing by the full row digest would move the row
    * and smear one corruption across two buckets as count drift).
    * Checksums SUM mod 1000000007, so row order and partitioning are
    * invisible. Compare two tables with an equi-join on `bucket` —
    * equal iff every (n_rows, checksum) pair matches. One
    * map-side-combined aggregation; output is buckets-sized.
    */
  def reconcile(df: DataFrame, keyCols: Seq[String], cols: Seq[String],
                buckets: Int = 16): DataFrame = {
    require(keyCols.nonEmpty, "reconcile needs key columns")
    require(cols.nonEmpty, "reconcile needs checksum columns")
    require(buckets >= 1, s"buckets=$buckets")
    // fused digest kernel: value-identical to
    // conv(substring(md5(concat_ws(0x1, ...)), 1, 15), 16, 10) - one
    // digest + shifts per row, no hex-string/substring/base-16-parse
    // materialization - and NON-NULLABLE, so a bucket equi-join's pushed
    // isnotnull() folds to true instead of re-running the digest per row
    def digest(cs: Seq[String]) = graft.plans.expressions.md5Head60(
      concat_ws("\u0001", cs.map(c => col(c).cast("string")): _*))
    // the mod-prime sum accumulates in DECIMAL(38,0) (the q119 export
    // precedent): a long accumulator overflows at ~9e18, within reach of
    // 1e10 rows × 1e9 residues at the 100 TB tier
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // pmod stays nullable in Catalyst (divisor-zero case) even over the
    // non-nullable digest, so a bucket equi-join would push an
    // isnotnull(pmod(digest…)) filter that RE-RUNS the digest per row;
    // the coalesce never fires (buckets >= 1, digest non-null) but makes
    // the key provably non-nullable, folding that filter to true
    df.select(coalesce(pmod(digest(keyCols), lit(buckets.toLong)), lit(0L))
          .as("bucket"),
        (digest(cols) % 1000000007L).as("_d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("_d").cast(dec38)) % 1000000007L).cast("long")
          .as("checksum"))
  }

  /** Exact inner-equi-join output cardinality of `left ⋈ right` on
    * `keyCols`, WITHOUT executing the join: one row
    * `(n_matching_keys, join_rows, max_key_contribution)` from the
    * per-key count relations of both sides joined on the key. NULL keys
    * never match in an equi-join and are excluded on both sides.
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String]): DataFrame = {
    val notNull = keyCols.map(c => col(c).isNotNull).reduce(_ && _)
    def sideCounts(df: DataFrame, alias: String) =
      df.filter(notNull).groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as(alias))
    sideCounts(left, "_cl").join(sideCounts(right, "_cr"), keyCols)
      .select((col("_cl") * col("_cr")).as("_k"))
      .agg(count(lit(1)).as("n_matching_keys"),
        sum(col("_k")).as("join_rows"),
        max(col("_k")).as("max_key_contribution"))
  }
}
