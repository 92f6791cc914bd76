package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph construction from tabular data — the step every graph operator
  * ([[Triangles]], [[KCore]], [[PageRank]], [[Dedup.starComponents]])
  * sits on top of.
  */
object Graphs {

  /** Co-occurrence projection of a bipartite (group, item) relation:
    * undirected item-item edges `(src, dst, weight)` with `src < dst`,
    * weight = number of distinct groups the pair shares (the
    * market-basket / co-citation / co-purchase graph).
    *
    * The 100 TB hazard of this shape is the DEGENERATE GROUP: pair
    * fanout is |g|²/2 per group, so one "null order" / empty-URL-host /
    * boilerplate-dedup-key group with 10⁶ members would emit 5·10¹¹
    * pairs from a single key — the job dies on one straggler partition.
    * Groups larger than `maxGroupSize` are therefore DROPPED, loudly
    * documented as the operator's contract (a hub group's pairs carry no
    * per-pair signal anyway — every pair in it shares only the
    * degenerate key). The size gate is a pre-aggregated `groupBy.count`
    * + semi-join, NOT an unbounded `count().over(partition)` window (the
    * window form re-introduces the very skew it guards against).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 1000): DataFrame =
    coOccurrenceEdgesFromPairs(
      df.select(col(groupCol).as("_g"), col(itemCol).cast("long").as("_i"))
        .filter(col("_g").isNotNull && col("_i").isNotNull)
        .distinct(), maxGroupSize)

  /** The deduped, non-null `(_g, _i)` pair relation behind
    * [[coOccurrenceEdges]], materialized ONCE (eager localCheckpoint) for
    * callers that consume it MORE than once. When the pair relation is
    * small enough that the [[coOccurrenceEdgesFromPairs]] self-join
    * broadcasts one side, Catalyst DUPLICATES the whole scan + distinct
    * chain under the BroadcastExchange instead of sharing it (exchange
    * reuse only dedupes shuffle subtrees) — and callers that also need
    * the pair relation itself (basket counts, item popularity) would
    * re-deduplicate a third time. Measured on the q132/q127/q129 shapes:
    * sharing the checkpoint is a 0.2–0.9 s/query win at sf0.1. For a
    * single-consumer sort-merge-sized input (q147/q148's full co-purchase
    * graph) the lazy [[coOccurrenceEdges]] form is cheaper — its two join
    * sides share one exchange at runtime and no materialization is paid.
    */
  private[graft] def coOccurrencePairs(df: DataFrame, groupCol: String,
                                       itemCol: String): DataFrame =
    df.select(col(groupCol).as("_g"), col(itemCol).cast("long").as("_i"))
      .filter(col("_g").isNotNull && col("_i").isNotNull)
      .distinct().localCheckpoint(true)

  /** [[coOccurrenceEdges]] over an already-deduped non-null `(_g, _i)`
    * pair relation (normally the [[coOccurrencePairs]] checkpoint).
    */
  private[graft] def coOccurrenceEdgesFromPairs(
      g: DataFrame, maxGroupSize: Int = 1000,
      respread: Boolean = false): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize=$maxGroupSize must be >= 2")
    val small = g.groupBy(col("_g")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxGroupSize)
      .select(col("_g"))
    // respread (opt-in): pin the self-join's parallelism to
    // defaultParallelism — the pair relation is compact (a group id +
    // a long), so with a broadcast-sized build side the k² explode — the
    // actual work — otherwise pipelines over the relation's couple of
    // AQE/source partitions while the rest of the cores idle (measured:
    // a 0.24 s single-straggler stage on q132 at sf0.1). Scale-adaptive
    // via defaultParallelism (the itemsets/bootstrap respread
    // precedent), never a tuned constant; callers whose explode is small
    // (subset graphs) skip it — the extra exchange costs more than the
    // parallelism pays there.
    val keep0 = g.join(small, Seq("_g"), "left_semi")
    val keep =
      if (respread)
        keep0.repartition(g.sparkSession.sparkContext.defaultParallelism,
          col("_g"))
      else keep0
    val a = keep.select(col("_g"), col("_i").as("src"))
    val b = keep.select(col("_g"), col("_i").as("dst"))
    a.join(b, Seq("_g"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg 2003):
    * for every NON-adjacent pair two hops apart, the three classic scores —
    * common-neighbor count `cn`, Jaccard `cn / (deg_u + deg_v − cn)`, and
    * Adamic-Adar `Σ_w 1/ln(deg w)` held as the exact integer
    * `aa_scaled = Σ_w floor(10⁹ / ln(deg w))` (float summation is
    * order-dependent; a sum of floored longs is not). Input edges are
    * treated as undirected; self-loops drop. Output: `(u, v, cn, jaccard,
    * aa_scaled)` with `u < v`.
    *
    * Scale shape: the wedge join `adj(u,w) ⋈ adj(w,v)` is the operator —
    * one shuffle keyed on the wedge center — and its 100 TB hazard is the
    * HUB center: a node of degree d emits d² candidate pairs, so one
    * celebrity node with 10⁶ neighbors is 10¹² rows from one key. Wedge
    * centers with degree > `maxWedgeDegree` are therefore dropped (size
    * gate by pre-aggregated count + semi-join, the [[coOccurrenceEdges]]
    * contract): `cn`/`aa` count NON-HUB common neighbors — the standard
    * practical estimator, since a hub neighbor carries ~1/ln(10⁶) signal
    * anyway — while `deg_u`/`deg_v` in the Jaccard denominator stay TRUE
    * degrees. The existing-edge exclusion is one anti-join.
    */
  def linkPredict(edges: DataFrame, maxWedgeDegree: Int = 1000): DataFrame = {
    require(maxWedgeDegree >= 2, s"maxWedgeDegree=$maxWedgeDegree must be >= 2")
    val dir = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // und feeds the degree table, both wedge legs and the anti-join —
    // truncate lineage ONCE so the (possibly expensive) upstream graph
    // construction is not re-executed per consumer (the [[PageRank]]
    // contract; at cluster scale substitute an intermediate table)
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val okCenters = deg.filter(col("deg") <= maxWedgeDegree).select(col("id"))
    // wedge u - w - v through non-hub centers, each center once per pair
    val viaW = und.select(col("b").as("w"), col("a").as("u"))
      .join(okCenters.withColumnRenamed("id", "w"), Seq("w"), "left_semi")
    val wedges = viaW
      .join(viaW.select(col("w"), col("u").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val nonEdges = wedges
      .join(und.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
    // a wedge center is adjacent to two distinct nodes, so deg(w) >= 2 and
    // ln(deg) > 0 — but compute the term only there (ANSI: x/0 errors)
    val degW = deg.filter(col("deg") >= 2).select(col("id").as("w"),
      floor(lit(1e9) / log(col("deg").cast("double"))).as("aa_term"))
    val scored = nonEdges.join(degW, Seq("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"), sum(col("aa_term")).as("aa_scaled"))
    scored
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("cn"),
        (col("cn").cast("double") /
          (col("du") + col("dv") - col("cn")).cast("double")).as("jaccard"),
        col("aa_scaled"))
  }

  /** Semi-supervised label propagation (clamped LPA, Zhu & Ghahramani
    * 2002 / Raghavan et al. 2007): seed labels spread over the undirected
    * graph for a FIXED number of rounds — each round, every node takes
    * the majority label among its labeled neighbors (ties → smallest
    * label, so every round is deterministic and SQL-provable); seed nodes
    * are CLAMPED to their given label. The weak-supervision primitive:
    * label a few thousand nodes, propagate to millions. Returns
    * `(id, label)` with label null where no seed is reachable within
    * `iters` hops. An id seeded twice keeps its smallest label
    * (documented determinism rule — validate seeds upstream).
    *
    * HUB HAZARD (measured, ScaleStressGraph): a high-degree node wired
    * across communities poisons LPA — it gets labeled in round 1 (it
    * neighbors some seed) and then outvotes still-unlabeled regions
    * before their own community labels reach them; on a planted
    * 100k-degree hub, 99% of a 100-community graph collapsed to one
    * label. DEGREE-GATE the edge list first (drop endpoints beyond the
    * [[linkPredict]] maxWedgeDegree-style threshold) — the gated run
    * recovers every community exactly.
    *
    * Scale shape: each round is one edge⋈labels shuffle + one grouped
    * vote + one `min_by((−count, label))` argmax — the PageRank round
    * shape with labels instead of mass; lineage truncated every 5 rounds.
    */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, iters: Int,
                     driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    require(driverEdgeLimit <= PageRank.driverEdgeCeiling,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver LPA " +
        "ceiling; larger graphs take the distributed path (lower " +
        "driverEdgeLimit instead of raising it)")
    val dir = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val sd = seeds
      .select(col("id").cast("long").as("id"), col("label").cast("long").as("_sl"))
      .filter(col("id").isNotNull && col("_sl").isNotNull)
      .groupBy(col("id")).agg(min(col("_sl")).as("_sl"))
    // one eager materialization of the undirected fold feeds the size
    // gate, the driver collect and every distributed round (the
    // [[PageRank]] contract)
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    // DRIVER loop under the edge ceiling (the [[PageRank]] precedent):
    // each LPA round is a synchronous vote barrier — pure job-scheduling
    // latency once the edge list fits in memory — and the vote/argmax
    // rule is order-independent, so both paths agree exactly (spec-pinned)
    if (und.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = und.sparkSession
      import spark.implicits._
      val es = und.collect().map(r => (r.getLong(0), r.getLong(1)))
      // dense-int remap for nodes AND labels (a label can only ever be a
      // seed label, so the label dictionary is the distinct seed-label
      // set): the vote table then keys on one packed long
      // (nodeIdx << 32 | labelIdx) instead of a boxed (Long, Long) tuple
      // per edge per round, and per-node state is primitive arrays
      // (§1.2 step 2). Vote/argmax rule unchanged: max count, ties to
      // the smallest label VALUE; seeds clamp.
      val m = es.length
      val idx = new java.util.HashMap[Long, Integer]()
      val ids = new scala.collection.mutable.ArrayBuffer[Long]()
      def codeOf(v: Long): Int = {
        val c = idx.get(v)
        if (c != null) c.intValue
        else { val nn = ids.length; idx.put(v, nn); ids += v; nn }
      }
      val srcI = new Array[Int](m)
      val dstI = new Array[Int](m)
      var k = 0
      while (k < m) {
        srcI(k) = codeOf(es(k)._1); dstI(k) = codeOf(es(k)._2); k += 1
      }
      val n = ids.length
      // after the undirected fold every endpoint appears as a source, so
      // the node universe (previous LinkedHashSet over sources) is the
      // src-side first-seen order
      val seenNode = new Array[Boolean](n)
      val nodeOrder = new scala.collection.mutable.ArrayBuffer[Int]()
      k = 0
      while (k < m) {
        val a = srcI(k)
        if (!seenNode(a)) { seenNode(a) = true; nodeOrder += a }
        k += 1
      }
      // label dictionary from the deduped seed relation; a seed id that
      // never appears in the graph gets code -1 lookups below and simply
      // never votes (exactly the previous containsKey semantics)
      val seedRows = sd.collect()
      val labelVals = new scala.collection.mutable.ArrayBuffer[Long]()
      val labelIdx = new java.util.HashMap[Long, Integer]()
      val seedOf = new Array[Int](n) // -1 = unseeded
      java.util.Arrays.fill(seedOf, -1)
      seedRows.foreach { r =>
        val id = r.getLong(0); val lv = r.getLong(1)
        var li = labelIdx.get(lv)
        if (li == null) {
          li = labelVals.length; labelIdx.put(lv, li); labelVals += lv
        }
        val c = idx.get(id)
        if (c != null) seedOf(c.intValue) = li.intValue
      }
      var lbl = new Array[Int](n) // label INDEX per node, -1 = unlabeled
      var v = 0
      while (v < n) { lbl(v) = seedOf(v); v += 1 }
      var i = 0
      while (i < iters) {
        // votes: for each edge (a → b), a's label votes on b
        val votes = new java.util.HashMap[java.lang.Long, Long]()
        k = 0
        while (k < m) {
          val la = lbl(srcI(k))
          if (la >= 0)
            votes.merge((dstI(k).toLong << 32) | la.toLong, 1L, _ + _)
          k += 1
        }
        // winner per node = max count, ties to smallest label VALUE
        val winIdx = new Array[Int](n)
        java.util.Arrays.fill(winIdx, -1)
        val winCnt = new Array[Long](n)
        votes.forEach { (key, c) =>
          val node = (key.longValue >>> 32).toInt
          val li = (key.longValue & 0xffffffffL).toInt
          val cur = winIdx(node)
          if (cur < 0 || c > winCnt(node) ||
              (c == winCnt(node) && labelVals(li) < labelVals(cur))) {
            winIdx(node) = li; winCnt(node) = c
          }
          ()
        }
        val next = new Array[Int](n)
        v = 0
        while (v < n) {
          next(v) = if (seedOf(v) >= 0) seedOf(v) else winIdx(v)
          v += 1
        }
        lbl = next
        i += 1
      }
      val out = Seq.newBuilder[(Long, Option[Long])]
      nodeOrder.foreach { nd =>
        out += ((ids(nd), if (lbl(nd) >= 0) Some(labelVals(lbl(nd))) else None))
      }
      return out.result().toDF("id", "label")
    }
    val nodes = und.select(col("a").as("id")).distinct()
    val base = nodes.join(sd, Seq("id"), "left").localCheckpoint(true)
    var labels = base.select(col("id"), col("_sl").as("lbl"))
    var i = 0
    while (i < iters) {
      val votes = und
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .filter(col("lbl").isNotNull)
        .groupBy(col("b").as("id"), col("lbl"))
        .agg(count(lit(1)).as("_c"))
      val winner = votes.groupBy(col("id"))
        .agg(expr("min_by(lbl, struct(-_c, lbl))").as("_win"))
      labels = base.join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("_sl"), col("_win")).as("lbl"))
      if ((i + 1) % 5 == 0 && i + 1 < iters)
        labels = labels.localCheckpoint(true)
      i += 1
    }
    labels.select(col("id"), col("lbl").as("label"))
  }

  /** Deterministic "random" walks (DeepWalk/node2vec corpus generation,
    * Perozzi et al. 2014): `walksPerNode` walks of `walkLen` steps from
    * every node, where step `i` of walk `(start, w)` moves to the
    * neighbor minimizing `md5(start‖w‖i‖neighbor)` — hash-derived, so
    * the walk corpus is REPRODUCIBLE (same graph → same corpus, any
    * engine, any partitioning; real RNG walks can't be oracle-checked
    * or replayed). Returns `(start, w, step, node)` with step 0 = start.
    * Dead-end nodes (after the undirected fold there are none unless
    * isolated) simply truncate their walk.
    *
    * Scale shape: one frontier⋈edges shuffle + a per-(walk, step)
    * `min_by` per step — walkLen is small and fixed; the frontier stays
    * nodes×walksPerNode-sized throughout. Lineage cut every few steps.
    */
  def deterministicWalks(edges: DataFrame, walkLen: Int,
                         walksPerNode: Int = 1,
                         driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(walkLen >= 1 && walkLen <= 40, s"walkLen=$walkLen out of [1,40]")
    require(walksPerNode >= 1 && walksPerNode <= 100,
      s"walksPerNode=$walksPerNode out of [1,100]")
    require(driverEdgeLimit <= PageRank.driverEdgeCeiling,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver walk " +
        "ceiling; larger graphs take the distributed path (lower " +
        "driverEdgeLimit instead of raising it)")
    val dir = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // one eager materialization + checkpointed size gate (the
    // [[labelPropagate]] contract)
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    // DRIVER loop under the edge ceiling (the [[PageRank]] precedent):
    // walkLen synchronous frontier barriers collapse to an in-memory
    // loop; the hash-argmin step rule is engine-independent (md5 of the
    // same rendered string, lexicographic hex order), so both paths
    // produce the identical walk corpus (spec-pinned)
    if (und.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = und.sparkSession
      import spark.implicits._
      val es = und.collect().map(r => (r.getLong(0), r.getLong(1)))
      // dense-int remap + CSR adjacency (edge order preserved — matches
      // the previous per-node append order), candidate-id decimal bytes
      // precomputed ONCE per node: the walk loop's cost is one md5 per
      // candidate (contract — the oracle replays the same argmin), and
      // the boxed adjacency buffers plus a fresh interpolated string per
      // candidate were a comparable second cost (§1.2 step 2)
      val m = es.length
      val idx = new java.util.HashMap[Long, Integer]()
      val ids = new scala.collection.mutable.ArrayBuffer[Long]()
      def codeOf(v: Long): Int = {
        val c = idx.get(v)
        if (c != null) c.intValue
        else { val nn = ids.length; idx.put(v, nn); ids += v; nn }
      }
      val srcI = new Array[Int](m)
      val dstI = new Array[Int](m)
      var k = 0
      while (k < m) {
        srcI(k) = codeOf(es(k)._1); dstI(k) = codeOf(es(k)._2); k += 1
      }
      val n = ids.length
      val deg = new Array[Int](n)
      k = 0; while (k < m) { deg(srcI(k)) += 1; k += 1 }
      val off = new Array[Int](n + 1)
      var v = 0
      while (v < n) { off(v + 1) = off(v) + deg(v); v += 1 }
      val fill = java.util.Arrays.copyOf(off, n)
      val nbr = new Array[Int](m)
      k = 0
      while (k < m) {
        val a = srcI(k); nbr(fill(a)) = dstI(k); fill(a) += 1; k += 1
      }
      // walk starts = source endpoints in first-seen edge order (the
      // previous LinkedHashSet semantics)
      val seenStart = new Array[Boolean](n)
      val starts = new scala.collection.mutable.ArrayBuffer[Int]()
      k = 0
      while (k < m) {
        val a = srcI(k)
        if (!seenStart(a)) { seenStart(a) = true; starts += a }
        k += 1
      }
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val candBytes: Array[Array[Byte]] =
        ids.map(_.toString.getBytes(utf8)).toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      // raw digest bytes, compared UNSIGNED-lexicographically: hex
      // encoding is order-preserving over unsigned byte order, so this
      // argmin picks exactly the candidate the distributed
      // `min_by(b, md5(...))` string comparison picks — without a
      // per-candidate hex format. The digest input is the shared
      // "start_w_i_" prefix bytes followed by the candidate's decimal
      // bytes — byte-identical (all ASCII) to the full rendered string.
      def ltUnsigned(x: Array[Byte], y: Array[Byte]): Boolean = {
        var k2 = 0
        while (k2 < x.length) {
          val a = x(k2) & 0xff; val b = y(k2) & 0xff
          if (a != b) return a < b
          k2 += 1
        }
        false
      }
      val out = Seq.newBuilder[(Long, Int, Int, Long)]
      starts.foreach { s0 =>
        val startId = ids(s0)
        var w = 0
        while (w < walksPerNode) {
          var node = s0
          out += ((startId, w, 0, ids(node)))
          var i = 1
          var dead = false
          while (i <= walkLen && !dead) {
            val d = deg(node)
            if (d == 0) dead = true
            else {
              val pre = s"${startId}_${w}_${i}_".getBytes(utf8)
              var best = -1
              var bestH: Array[Byte] = null
              var j = off(node)
              val end = j + d
              while (j < end) {
                val c = nbr(j)
                md.reset()
                md.update(pre)
                md.update(candBytes(c))
                val h = md.digest()
                if (bestH == null || ltUnsigned(h, bestH)) {
                  best = c; bestH = h
                }
                j += 1
              }
              node = best
              out += ((startId, w, i, ids(node)))
            }
            i += 1
          }
          w += 1
        }
      }
      return out.result().toDF("start", "w", "step", "node")
    }
    var frontier = und.select(col("a").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("w"))
      .withColumn("node", col("start"))
    var out = frontier.withColumn("step", lit(0))
    var i = 1
    while (i <= walkLen) {
      // next node = argmin md5(start‖w‖step‖candidate) over neighbors
      frontier = frontier
        .join(und, frontier("node") === und("a"))
        .groupBy(col("start"), col("w"))
        .agg(min_by(col("b"), md5(concat_ws("_",
          col("start"), col("w"), lit(i), col("b")))).as("node"))
      out = out.unionByName(frontier.withColumn("step", lit(i)))
      if (i % 5 == 0 && i < walkLen) frontier = frontier.localCheckpoint(true)
      i += 1
    }
    out.select(col("start"), col("w"), col("step"), col("node"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the directed doubling of the undirected edge
    * set — one number answering "do hubs link to hubs (r > 0) or to
    * leaves (r < 0)", the first structural question asked of any link
    * graph. One row: `n` (directed edge count), `r`. Exact integer
    * moments via [[Stats.pearson]]; one degree join + one global
    * aggregate.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val dir = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // und feeds the degree build and both endpoint joins — one lineage cut
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    val withDegs = und
      .join(deg.select(col("id").as("a"), col("deg").as("dx")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("dy")), Seq("b"))
    Stats.pearson(withDegs, Seq.empty, "dx", "dy")
  }
}
