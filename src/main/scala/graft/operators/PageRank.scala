package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (public algorithm, Brin & Page 1998) in SCALED
  * INTEGER arithmetic — link-graph authority scoring for corpus curation
  * (rank web domains/documents by citation structure before sampling).
  *
  * Why integers: the canonical floating-point formulation sums incoming
  * contributions, and float addition is order-dependent — a distributed
  * run would not be bit-reproducible, and no SQL oracle could pin it.
  * Here ranks are longs scaled by `scale`; each iteration computes
  *
  *   contrib(u→v) = (r(u) * damp85) div (100 * outdeg(u))      [floor]
  *   r'(v)        = (scale * 15) div 100  +  Σ contrib(u→v)
  *
  * — all integer ops, so the result is EXACT, order-independent, and
  * reproducible in any engine with 64-bit integer division. Dangling
  * nodes' mass is dropped (the simplest public formulation; ranks are
  * comparative, not a probability distribution).
  *
  * Scale shape: each iteration is one join of the rank table against the
  * edge list (shuffle keyed on node id) + one grouped sum — the classic
  * MapReduce PageRank round. Lineage is truncated per iteration with an
  * eager localCheckpoint (same contract as [[Dedup.starComponents]]).
  * Iterations are FIXED (deterministic output), not convergence-driven.
  */
object PageRank {

  def scaledRanks(edges: DataFrame, iters: Int,
                  scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct().localCheckpoint(true)
    // out-degree pre-joined onto the edge list ONCE: the loop then does a
    // single rank⋈edge join per iteration instead of rank⋈deg⋈edge, and
    // the static relations don't recompute under each checkpoint action
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    var i = 0
    while (i < iters) {
      val contrib = ranks
        .join(eDeg, ranks("id") === eDeg("src"))
        .select(col("dst").as("id"),
          expr("(rank * 85) div (100 * deg)").as("c"))
      ranks = nodes
        .join(contrib.groupBy(col("id")).agg(sum(col("c")).as("in_c")),
          Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_c"), lit(0L))).as("rank"))
      // each rank feeds the next iteration exactly once, so a short loop
      // is a pure chain one action executes end-to-end — checkpoint only
      // every few iterations to bound plan growth on long runs, not per
      // iteration (which forces a full materialization each round)
      if ((i + 1) % 5 == 0 && i + 1 < iters)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart to a SEED SET): the
    * teleport mass lands only on `seeds` instead of uniformly, so ranks
    * measure proximity to the seeds — "more like these" corpus expansion,
    * seed-anchored recommendation, trust propagation. Same scaled-integer
    * contract as [[scaledRanks]] (bit-exact, SQL-provable):
    *
    *   r0(v)  = scale·[v ∈ S]
    *   r'(v)  = (scale·15 div 100)·[v ∈ S]  +  Σ contrib(u→v)
    *
    * `seeds` is a 1-column (`id`) relation; seed ids absent from the
    * graph contribute nothing. Scale shape: identical to
    * [[scaledRanks]] — one rank⋈edge join + grouped sum per iteration;
    * the seed flag is pre-joined onto the node table once (seed relations
    * are small → AQE broadcasts them).
    */
  def scaledRanksPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                              scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
      .join(sd.withColumn("_s", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), lit(false)).as("_seed"))
      .localCheckpoint(true)
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    var ranks = nodes.select(col("id"),
      when(col("_seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = ranks
        .join(eDeg, ranks("id") === eDeg("src"))
        .select(col("dst").as("id"),
          expr("(rank * 85) div (100 * deg)").as("c"))
      ranks = nodes
        .join(contrib.groupBy(col("id")).agg(sum(col("c")).as("in_c")),
          Seq("id"), "left")
        .select(col("id"),
          (when(col("_seed"), lit(base)).otherwise(lit(0L)) +
            coalesce(col("in_c"), lit(0L))).as("rank"))
      if ((i + 1) % 5 == 0 && i + 1 < iters)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
