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
  *    from a count-min pass. Any key with true per-partition frequency
  *    above partitionRows/capacity is always a candidate; recall below
  *    that threshold, and the CMS ranking, are high-probability
  *    properties (ε, confidence), not certainties — overfetch and
  *    exact-re-rank when exactness is required.
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
    * partitionRows/capacity are guaranteed present; below that threshold
    * presence depends on arrival order (the standard SpaceSaving
    * contract).
    *
    * Eviction uses a lazy-deletion min-heap (O(log capacity) amortized,
    * vs an O(capacity) scan per overflowing row — the overflow path IS
    * the hot path on long-tailed data). Stale heap entries are compacted
    * when they outnumber live ones 8:1, keeping memory O(capacity).
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
      val counts = new java.util.HashMap[Any, Long](capacity * 2)
      // min-heap of (count-at-push, key); an entry is live iff its count
      // still matches counts(key)
      val heap = new java.util.PriorityQueue[(Long, Any)](
        capacity, (a: (Long, Any), b: (Long, Any)) =>
          java.lang.Long.compare(a._1, b._1))
      def push(k: Any, v: Long): Unit = {
        heap.add((v, k))
        if (heap.size > capacity * 8) { // compact stale entries
          heap.clear()
          counts.forEach((k2, v2) => heap.add((v2, k2)))
        }
      }
      it.foreach { r =>
        val k = r.get(0)
        if (k != null) {
          if (counts.containsKey(k)) {
            val v = counts.get(k) + 1L
            counts.put(k, v); push(k, v)
          } else if (counts.size < capacity) {
            counts.put(k, 1L); push(k, 1L)
          } else {
            // pop to the first LIVE minimum, evict it, adopt its count
            var min = heap.poll()
            while (!counts.containsKey(min._2) || counts.get(min._2) != min._1)
              min = heap.poll()
            counts.remove(min._2)
            val v = min._1 + 1L
            counts.put(k, v); push(k, v)
          }
        }
      }
      val out = Seq.newBuilder[Row]
      counts.forEach((k, v) => out += Row(k, v))
      out.result().iterator
    }(enc)
  }

  /** Approximate top-k: SpaceSaving candidates (bounded per-partition
    * state, deduped) ranked by count-min estimates. Returns
    * `(item, est_count)`, estimate-descending then item order for
    * determinism.
    *
    * Probabilistic contract, not a hard guarantee: keys with true
    * per-partition frequency above partitionRows/capacity are always
    * candidates; lighter keys survive eviction only arrival-dependently,
    * and each CMS estimate honors its ε·N bound with probability
    * `confidence`. For exact-top-k use, OVERFETCH (k larger than needed)
    * and re-rank the candidates by exact counts — the q61 pattern.
    */
  def heavyHitters(df: DataFrame, colName: String, k: Int,
                   capacity: Int = 1024, eps: Double = 0.0001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val cms = countMin(df, colName, eps, confidence, seed)
    val spark = df.sparkSession
    val bcCms = spark.sparkContext.broadcast(cms)
    val cands = spaceSavingCandidates(df, colName, capacity)
      .select(col("item")).distinct()
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
