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
  *
  * Graphs under `driverEdgeLimit` edges iterate on the DRIVER (the
  * [[Dedup.connectedComponents]] union-find / [[KCore]] peeling
  * precedent): a fixed-iteration rank loop is `iters` SYNCHRONOUS rounds
  * of pure job-scheduling latency once the edge list fits in memory, and
  * the integer arithmetic is order-independent, so both paths produce
  * bit-identical ranks (spec-pinned). The limit is capped at 10M edges —
  * the driver path is a bounded fast path, never an opt-in to a
  * driver-OOM-scale collect.
  */
object PageRank {

  private[operators] val driverEdgeCeiling = 10000000L

  /** Shared driver-side rank loop: `seedSet = None` is uniform PageRank
    * (r0 = scale everywhere, teleport everywhere); `Some(s)` is the
    * personalized variant (r0/teleport on the seed set only). Arithmetic
    * is EXACTLY the distributed round's: long multiply + floor division
    * on non-negative values.
    */
  private def driverRanks(es: Array[(Long, Long)], iters: Int, scale: Long,
                          seedSet: Option[scala.collection.Set[Long]])
      : Seq[(Long, Long)] = {
    // dense-int remap in FIRST-SEEN (src-then-dst per edge) order — the
    // same node order the previous LinkedHashSet produced, so the output
    // row order is unchanged. The rank loop then runs on primitive
    // arrays: the boxed HashMap.merge per edge per round dominated the
    // driver path at 600k edges (§1.2 step 2 — per-task work).
    val m = es.length
    val idx = new java.util.HashMap[Long, Integer]()
    val ids = new scala.collection.mutable.ArrayBuffer[Long]()
    def code(v: Long): Int = {
      val c = idx.get(v)
      if (c != null) c.intValue
      else { val n = ids.length; idx.put(v, n); ids += v; n }
    }
    val srcI = new Array[Int](m)
    val dstI = new Array[Int](m)
    var k = 0
    while (k < m) {
      srcI(k) = code(es(k)._1); dstI(k) = code(es(k)._2); k += 1
    }
    val n = ids.length
    val deg = new Array[Long](n)
    k = 0; while (k < m) { deg(srcI(k)) += 1L; k += 1 }
    val base = scale * 15L / 100L
    val seed = new Array[Boolean](n)
    var v = 0
    while (v < n) { seed(v) = seedSet.forall(_.contains(ids(v))); v += 1 }
    var rank = new Array[Long](n)
    v = 0; while (v < n) { rank(v) = if (seed(v)) scale else 0L; v += 1 }
    var i = 0
    while (i < iters) {
      val next = new Array[Long](n)
      v = 0; while (v < n) { next(v) = if (seed(v)) base else 0L; v += 1 }
      k = 0
      while (k < m) {
        val u = srcI(k)
        next(dstI(k)) += rank(u) * 85L / (100L * deg(u))
        k += 1
      }
      rank = next
      i += 1
    }
    val out = Seq.newBuilder[(Long, Long)]
    v = 0; while (v < n) { out += ((ids(v), rank(v))); v += 1 }
    out.result()
  }

  def scaledRanks(edges: DataFrame, iters: Int,
                  scale: Long = 1000000000L,
                  driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(driverEdgeLimit <= driverEdgeCeiling,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver rank-loop " +
        "ceiling; larger graphs take the distributed path (lower " +
        "driverEdgeLimit instead of raising it)")
    // one eager materialization of the deduped edge relation feeds the
    // size gate, the driver collect AND every distributed-loop consumer —
    // an un-checkpointed gate would recompute a possibly expensive
    // upstream (e.g. a co-occurrence projection) once per action
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    if (e.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = e.sparkSession
      import spark.implicits._
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      return driverRanks(es, iters, scale, None).toDF("id", "rank")
    }
    // nodes has exactly ONE consumer now (the single post-loop join), so
    // no eager checkpoint: it evaluates lazily off the checkpointed e
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    // out-degree annotated onto the edge list ONCE, as a whole-partition
    // count window keyed on src: one exchange + one pass over e instead of
    // the groupBy+join form's aggregate exchange plus a second probe scan
    // (§2.4 — an aggregation and a "join" keyed the same way share one
    // exchange). Skew posture unchanged: the join form's sort-merge
    // fallback colocates by src exactly like the window does.
    val eDeg = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    // loop state = the INBOUND SUM only (`in_c`), not the full rank table:
    // every node's rank is base + coalesce(in_c, 0) from round 1 on, so
    // carrying in_c instead of rank drops the per-round nodes⋈ranks left
    // join (one exchange + sort per round in the r11 shape) — the node
    // table is joined back exactly ONCE after the loop. Round 1 needs no
    // join at all: rank₀ = scale everywhere, so each edge contributes
    // (scale·85) div (100·deg) straight off the static eDeg relation.
    var inC = eDeg
      .select(col("dst").as("id"),
        expr(s"(${scale}L * 85) div (100 * deg)").as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("in_c"))
    var i = 1
    while (i < iters) {
      // rank_{i}(u) = base + in_c(u) (0 when unreferenced) — left join
      // from the EDGE side keeps every contributing source
      inC = eDeg
        .join(inC.withColumnRenamed("id", "src"), Seq("src"), "left")
        .select(col("dst").as("id"),
          expr(s"((${base}L + coalesce(in_c, 0L)) * 85) div (100 * deg)")
            .as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_c"))
      // each in_c feeds the next iteration exactly once, so a short loop
      // is a pure chain one action executes end-to-end — checkpoint only
      // every few iterations to bound plan growth on long runs, not per
      // iteration (which forces a full materialization each round)
      if ((i + 1) % 5 == 0 && i + 1 < iters)
        inC = inC.localCheckpoint(true)
      i += 1
    }
    nodes.join(inC, Seq("id"), "left")
      .select(col("id"),
        (lit(base) + coalesce(col("in_c"), lit(0L))).as("rank"))
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
                              scale: Long = 1000000000L,
                              driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(driverEdgeLimit <= driverEdgeCeiling,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver rank-loop " +
        "ceiling; larger graphs take the distributed path (lower " +
        "driverEdgeLimit instead of raising it)")
    // checkpointed size gate, as in [[scaledRanks]]
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
    if (e.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = e.sparkSession
      import spark.implicits._
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      // seed ids outside the graph contribute nothing in the distributed
      // round (nodes ⋈ seeds is a left join from the node side), so the
      // in-memory seed set need not be pruned to the graph first; the
      // seed relation is small by contract ("seed set")
      val sset = sd.collect().map(_.getLong(0)).toSet
      return driverRanks(es, iters, scale, Some(sset)).toDF("id", "rank")
    }
    // single post-loop consumer — no eager checkpoint (see scaledRanks)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
      .join(sd.withColumn("_s", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), lit(false)).as("_seed"))
    // degree + seed flag annotated onto the static edge relation in ONE
    // exchange: the out-degree is a whole-partition count window keyed on
    // src (§2.4 — replaces the groupBy+join form's aggregate exchange and
    // second probe scan of e), and the seed flag joins broadcast (seed
    // sets are small by contract), so the loop below never touches the
    // node table: same in_c-only state as [[scaledRanks]]
    val eDeg = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .join(sd.withColumnRenamed("id", "src").withColumn("_ss", lit(true)),
        Seq("src"), "left")
      .select(col("src"), col("dst"), col("deg"),
        coalesce(col("_ss"), lit(false)).as("_sseed"))
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    // rank_i(u) = [seed u]·base + in_c(u) for i ≥ 1; rank₀ = scale·[seed],
    // so round 1 reads straight off the static relation (no join)
    var inC = eDeg
      .filter(col("_sseed"))
      .select(col("dst").as("id"),
        expr(s"(${scale}L * 85) div (100 * deg)").as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("in_c"))
    var i = 1
    while (i < iters) {
      inC = eDeg
        .join(inC.withColumnRenamed("id", "src"), Seq("src"), "left")
        .select(col("dst").as("id"),
          expr(s"(((CASE WHEN _sseed THEN ${base}L ELSE 0L END) + " +
            "coalesce(in_c, 0L)) * 85) div (100 * deg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_c"))
      if ((i + 1) % 5 == 0 && i + 1 < iters)
        inC = inC.localCheckpoint(true)
      i += 1
    }
    nodes.join(inC, Seq("id"), "left")
      .select(col("id"),
        (when(col("_seed"), lit(base)).otherwise(lit(0L)) +
          coalesce(col("in_c"), lit(0L))).as("rank"))
  }
}
