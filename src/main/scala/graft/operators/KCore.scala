package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (public algorithm: repeatedly
  * delete nodes of degree < k; what survives is the k-core). The graph
  * curation workhorse: a corpus link graph's k-core isolates the densely
  * cross-linked region (spam farms, boilerplate mirrors) and drops the
  * long pendant tail; conversely low-core nodes are the organic periphery.
  *
  * Distributed shape (graphs past `driverEdgeLimit`): INCREMENTAL
  * peeling — a maintained (node, within-survivor degree) relation; each
  * round subtracts one per edge into the just-removed set (removed-sized
  * join, AQE broadcasts it once removals shrink) and the convergence
  * count rides the round's checkpoint as an Observation — one job per
  * round, delta-sized work. Graphs under the limit peel on the DRIVER
  * (the [[Dedup.connectedComponents]] union-find precedent): peeling is
  * O(diameter) SYNCHRONOUS rounds, pure job-scheduling latency when the
  * edge list fits in memory. Both paths implement the same round
  * semantics exactly (simultaneous removal of survivors with degree < k).
  * `maxRounds` bounds the worst case (a k=2 path graph peels one layer
  * per round — O(diameter) rounds); if the cap is hit the result is the
  * round-`maxRounds` survivor SUPERSET of the k-core, so an oracle must
  * apply the same cap. Per-round state is truncated with an eager
  * localCheckpoint, or durable parquet when `scratchDir` is set (the
  * cluster-scale path — same contract as [[Dedup.minhashDedupExact]]).
  */
object KCore {

  /** Nodes of the k-core of the undirected graph in `edges` (`src`/`dst`;
    * direction, duplicates, self-loops ignored) with their core-internal
    * degree: (`node_id`, `core_degree`).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30,
            scratchDir: Option[String] = None,
            driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(maxRounds >= 1, s"maxRounds=$maxRounds must be >= 1")
    // same ceiling contract as [[Dedup.connectedComponents]]: the driver
    // path is a bounded-size fast path, never a way to opt into a
    // driver-OOM-scale collect
    require(driverEdgeLimit <= 10000000L,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver peeling " +
        "ceiling; larger graphs take the distributed incremental path " +
        "(lower driverEdgeLimit instead of raising it)")
    val und = Dedup.materializeEager(edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct(), scratchDir)

    // DRIVER peeling under the edge ceiling ([[Dedup.connectedComponents]]
    // precedent): peeling needs O(diameter) SYNCHRONOUS rounds, and at
    // bench/edge-list-fits-in-memory sizes ~20 rounds of Spark jobs are
    // pure fixed scheduling latency (measured 4 s for a 100k-edge graph
    // whose in-memory peel is < 10 ms). Round semantics are IDENTICAL to
    // the distributed loop: simultaneous removal of every survivor with
    // within-survivor degree < k, maxRounds cap, d = 0 survivors dropped
    // from the output.
    if (und.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = und.sparkSession
      import spark.implicits._
      val es = und.collect().map(r => (r.getLong(0), r.getLong(1)))
      val adjM = scala.collection.mutable.Map[Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (a, b) =>
        adjM.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
        adjM.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
      }
      val d = scala.collection.mutable.Map[Long, Long]()
      adjM.foreach { case (v, ns) => d(v) = ns.length.toLong }
      val out = scala.collection.mutable.Set[Long](adjM.keys.toSeq: _*)
      var r = 0
      var done = false
      while (r < maxRounds && !done) {
        val removed = out.iterator.filter(v => d(v) < k).toArray
        if (removed.isEmpty) done = true
        else {
          removed.foreach(out -= _)
          removed.foreach { v =>
            adjM(v).foreach { u => if (out.contains(u)) d(u) -= 1 }
          }
          r += 1
        }
      }
      return out.iterator.map(v => (v, d(v))).filter(_._2 > 0).toSeq
        .toDF("node_id", "core_degree")
    }

    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nb")))

    // INCREMENTAL peeling (same fixpoint, delta-sized rounds): instead of
    // recomputing every survivor's degree from the full adjacency each
    // round (two corpus-sized semi-joins + a grouped count + a separate
    // convergence count job per round — the r11 shape), maintain a
    // (node, within-survivor degree) relation and per round subtract one
    // from each edge into the JUST-removed set. Removed sets shrink fast
    // after round 1, so the per-round join is removed-sized (AQE
    // broadcasts it) rather than graph-sized, and the per-round
    // convergence count rides the checkpoint action as an Observation —
    // ONE job per round instead of two. The maintained degree IS the
    // core-internal degree, so the final recount join is gone too.
    def observedPrunable(d: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val out = Dedup.materializeEager(
        d.observe(obs, sum(when(col("d") < k, 1L).otherwise(0L)).as("p")),
        scratchDir)
      // scratchDir path: the parquet write consumed the observation; the
      // local path's checkpoint did too — read is safe in both
      val prunable = Option(obs.get("p")).map(_.asInstanceOf[Long]).getOrElse(0L)
      (out, prunable)
    }
    var (deg, prunable) = observedPrunable(
      adj.groupBy(col("id")).agg(count(lit(1)).as("d")))
    var r = 0
    while (r < maxRounds && prunable > 0) {
      val removed = deg.filter(col("d") < k).select(col("id"))
      val survivors = deg.filter(col("d") >= k)
      // edges from a survivor into the removed set, one decrement each
      val delta = adj
        .join(removed.withColumnRenamed("id", "nb"), Seq("nb"), "left_semi")
        .groupBy(col("id")).agg(count(lit(1)).as("_dec"))
      val nextDeg = survivors.join(delta, Seq("id"), "left")
        .select(col("id"),
          (col("d") - coalesce(col("_dec"), lit(0L))).as("d"))
      val (d2, p2) = observedPrunable(nextDeg)
      deg = d2
      prunable = p2
      r += 1
    }
    // output = the current survivor set with its maintained in-core
    // degree. At the maxRounds cap survivors may carry d < k (the
    // documented bounded-round SUPERSET) — keep them; drop d = 0 rows
    // (a survivor whose last neighbors were all just peeled), which the
    // adjacency-recount formulation never emitted.
    deg.filter(col("d") > 0)
      .select(col("id").as("node_id"), col("d").as("core_degree"))
  }
}
