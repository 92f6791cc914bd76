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

  /** KMV (k-minimum-values) distinct sketch — Bar-Yossef et al.'s
    * counting-distinct-elements structure, the core of the theta sketch
    * family. Keeps the k smallest DISTINCT 64-bit hashes of a set;
    * θ = normalized k-th minimum. Unlike HLL (which Spark's
    * approx_count_distinct already provides, and [[graft.operators.IncrementalDistinct]]
    * maintains incrementally), KMV sketches compose under SET ALGEBRA:
    * union is "merge mins, keep k smallest", and intersection is
    * estimated from the common samples below min(θ_A, θ_B) — the
    * cross-segment overlap question (`|users(A) ∩ users(B)|`) that
    * exact distinct-joins need a full shuffle for at 100 TB.
    *
    * `mins` is sorted ascending in SIGNED long order; the normalization
    * u(h) maps that order monotonically onto [0, 1).
    */
  case class KmvSketch(k: Int, mins: Array[Long]) {
    import KmvSketch.u
    require(mins.length <= k, s"${mins.length} mins exceed k=$k")

    /** True while the set had fewer than k distinct hashes — the sketch
      * IS the set and every estimate below is exact.
      */
    def isExact: Boolean = mins.length < k
    def theta: Double = if (isExact) 1.0 else u(mins.last)
    def estimate: Double =
      if (isExact) mins.length.toDouble else (k - 1).toDouble / theta

    /** Union sketch: the k smallest of the merged min-sets (the k
      * smallest hashes of A ∪ B are necessarily among the k smallest of
      * A plus the k smallest of B).
      */
    def union(o: KmvSketch): KmvSketch = {
      val kk = math.min(k, o.k)
      KmvSketch(kk, (mins ++ o.mins).distinct.sorted.take(kk))
    }

    /** Theta-sketch intersection estimate: samples below
      * θ = min(θ_A, θ_B) are a uniform θ-rate sample of each set, so
      * the common ones estimate |A ∩ B| · θ. Error scales with
      * 1/√k RELATIVE TO THE UNION size, not the intersection — small
      * overlaps of huge sets carry large relative error (inherent to
      * the sketch family, not this implementation).
      */
    def intersectEstimate(o: KmvSketch): Double = {
      val th = math.min(theta, o.theta)
      val mine = mins.iterator.filter(h => u(h) < th).toSet
      val common = o.mins.count(h => u(h) < th && mine.contains(h))
      common.toDouble / th
    }
  }

  object KmvSketch {
    /** Signed-order-preserving map of a 64-bit hash onto [0, 1). */
    def u(h: Long): Double = h.toDouble / 1.8446744073709552e19 + 0.5
  }

  /** One KMV sketch per group value, built in a single pass: distinct
    * (group, hash) → per-group k smallest via a rank window (Spark plans
    * the `row_number ≤ k` filter as WindowGroupLimit — per-partition
    * top-k heaps BEFORE the shuffle, so the exchange carries at most
    * k·groups·partitions rows, never the distinct values themselves).
    * Driver state is the sketches alone, loudly capped.
    */
  def kmvByGroup(df: DataFrame, groupCol: String, valueCol: String, k: Int,
                 maxGroups: Int = 1024): Map[String, KmvSketch] = {
    require(k >= 2, s"k=$k too small")
    require(k.toLong * maxGroups <= 4000000L,
      s"k=$k × maxGroups=$maxGroups exceeds the 4M-hash driver budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    val rows = df
      .select(col(groupCol).cast("string").as("g"),
        xxhash64(col(valueCol)).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("g")).agg(sort_array(collect_list(col("h"))).as("hs"))
      .collect()
    require(rows.length <= maxGroups,
      s"${rows.length} groups exceed maxGroups=$maxGroups")
    rows.map(r => r.getString(0) ->
      KmvSketch(k, r.getSeq[Long](1).toArray)).toMap
  }
}
