package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-partition fact tables on their join key so
  * repeated fact-fact joins read co-located buckets and skip the exchange
  * entirely (both sides hash-partitioned identically at write time).
  *
  * At the 100 TB point this converts every recurring join on the bucket key
  * from a full shuffle into a zipped per-bucket merge — the write-once,
  * join-many trade the reference delegates to Snowflake micro-partitions.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. `numBuckets` should
    * match the cluster's target parallelism for the table's size.
    */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Join two same-bucketed tables on their bucket key — plans with no
    * Exchange when both sides were written with the same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
