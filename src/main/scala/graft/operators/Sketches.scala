package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Bounded-memory frequency sketching: count-min estimates and
  * space-saving heavy hitters. The exact `groupBy(col).count` top-k
  * (q48) is right while the key cardinality fits a shuffle; these are
  * the 100 TB fallbacks when it doesn't — every structure here is
  * O(sketch size), never O(distinct keys):
  *
  *  - [[countMin]]: one pass, per-partition sketches merged pairwise
  *    (`df.stat.countMinSketch` runs as an RDD aggregate — no shuffle of
  *    the keys, only sketch merges). Point-lookup estimates NEVER
  *    undercount; overcount ≤ eps·N with probability ≥ confidence.
  *  - [[heavyHitters]]: candidates from per-partition SpaceSaving
  *    summaries (Metwally et al., the frequent-items standard), counts
  *    from a count-min pass. Any key with true frequency > N/capacity is
  *    GUARANTEED to be among the candidates (per-partition guarantee
  *    unioned over partitions), so top-k recall is exact for genuinely
  *    heavy keys; the CMS estimate then ranks them.
  */
object Sketches {

  /** Count-min sketch of `colName` (string/integral), one distributed
    * pass. `eps` bounds relative overcount (ε·N), `confidence` the
    * probability of that bound.
    */
  def countMin(df: DataFrame, colName: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(col(colName), eps, confidence, seed)

  /** Per-partition SpaceSaving candidate set: each partition tracks at
    * most `capacity` keys with the classic min-replacement rule, then
    * emits (key, upperBoundCount). Keys with true per-partition count >
    * partitionRows/capacity are guaranteed present.
    */
  private[graft] def spaceSavingCandidates(
      df: DataFrame, colName: String, capacity: Int): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item",
        df.schema(df.schema.fieldIndex(colName)).dataType),
      org.apache.spark.sql.types.StructField("ub",
        org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(colName)).mapPartitions { it =>
      // SpaceSaving: bounded map; on overflow, evict the min-count entry
      // and ADOPT its count + 1 (the new key inherits the evictee's upper
      // bound — the overestimate that makes the guarantee work)
      val counts = new java.util.HashMap[Any, Long](capacity * 2)
      it.foreach { r =>
        val k = r.get(0)
        if (k != null) {
          if (counts.containsKey(k)) counts.put(k, counts.get(k) + 1L)
          else if (counts.size < capacity) counts.put(k, 1L)
          else {
            var minK: Any = null; var minV = Long.MaxValue
            val eit = counts.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              if (e.getValue < minV) { minV = e.getValue; minK = e.getKey }
            }
            counts.remove(minK)
            counts.put(k, minV + 1L)
          }
        }
      }
      val out = Seq.newBuilder[Row]
      counts.forEach((k, v) => out += Row(k, v))
      out.result().iterator
    }(enc)
  }

  /** Approximate top-k: SpaceSaving candidates (bounded per-partition
    * state, unioned + re-summed) ranked by count-min estimates. Returns
    * `(item, est_count)`, estimate-descending then item order for
    * determinism. `capacity` trades memory for the guaranteed-recall
    * threshold N_partition/capacity.
    */
  def heavyHitters(df: DataFrame, colName: String, k: Int,
                   capacity: Int = 1024, eps: Double = 0.0001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val cms = countMin(df, colName, eps, confidence, seed)
    val spark = df.sparkSession
    val bcCms = spark.sparkContext.broadcast(cms)
    val cands = spaceSavingCandidates(df, colName, capacity)
      .groupBy(col("item")).agg(sum(col("ub")).as("_ub"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item",
        df.schema(df.schema.fieldIndex(colName)).dataType),
      org.apache.spark.sql.types.StructField("est_count",
        org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val estimated = cands.mapPartitions { it =>
      val s = bcCms.value
      it.map(r => Row(r.get(0), s.estimateCount(r.get(0))))
    }(enc)
    estimated.orderBy(desc("est_count"), col("item")).limit(k)
  }
}
