package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (public algorithm: repeatedly
  * delete nodes of degree < k; what survives is the k-core). The graph
  * curation workhorse: a corpus link graph's k-core isolates the densely
  * cross-linked region (spam farms, boilerplate mirrors) and drops the
  * long pendant tail; conversely low-core nodes are the organic periphery.
  *
  * Each round is two hash semi-joins (edge endpoints against the current
  * survivor set) + one grouped count — node/edge-keyed shuffles only,
  * nothing broadcast, nothing collected but a per-round COUNT(1) scalar,
  * so a round costs the same plan at any scale. Survivor sets shrink
  * monotonically; the loop exits at the first fixpoint (count unchanged).
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
            scratchDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(maxRounds >= 1, s"maxRounds=$maxRounds must be >= 1")
    val und = Dedup.materializeEager(edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct(), scratchDir)
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nb")))

    var survivors = Dedup.materializeEager(
      adj.select(col("id")).distinct(), scratchDir)
    var n = survivors.count()
    var r = 0
    var converged = false
    while (r < maxRounds && !converged) {
      val next = Dedup.materializeEager(adj
        .join(survivors, Seq("id"), "left_semi")
        .join(survivors.select(col("id").as("nb")), Seq("nb"), "left_semi")
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("id")), scratchDir)
      val nNext = next.count()
      converged = nNext == n // shrinking sets: equal count = equal set
      survivors = next
      n = nNext
      r += 1
    }
    adj
      .join(survivors, Seq("id"), "left_semi")
      .join(survivors.select(col("id").as("nb")), Seq("nb"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))
      .select(col("id").as("node_id"), col("core_degree"))
  }
}
