package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graphs, Stats}

/** Graph/stats-tier scale stress (run manually: `sbt "Test/runMain
  * graft.ScaleStressGraph"`): the structural hazards the X110/X120/X122
  * operators are designed around, at a scale where getting them wrong is
  * visible —
  *
  *  1. a 100-community expander graph (100k nodes, ~1.1M directed edge
  *     rows) PLUS one planted 100k-degree hub wired into every community:
  *     `linkPredict` must gate the hub (otherwise the hub alone emits
  *     ~10¹⁰ wedges) and every surviving prediction must be
  *     intra-community — cross-community pairs can ONLY arise through
  *     the hub, so one such pair = the gate failed;
  *  2. clamped label propagation with one seed per community — TWICE:
  *     on the degree-gated graph (hub edges dropped, the practitioner
  *     preprocessing) full recovery with zero contamination is REQUIRED;
  *     on the raw hub graph the poisoning is ASSERTED TOO — the hub ties
  *     to the smallest seed label in round 1 (it neighbors every seed)
  *     and then outvotes unlabeled regions before community labels reach
  *     them, so most of the graph collapses to label 0. Both behaviors
  *     are pinned: the gate isn't a micro-optimization, it's what makes
  *     LPA correct on hub-bearing graphs;
  *  3. KS / Wasserstein-1 over 20M rows whose statistics have CLOSED
  *     FORMS (uniform vs 10%-shifted uniform: D = 0.1 exactly, W1 =
  *     shift exactly) — the value-granularity collapse is what makes
  *     these tractable, and exactness at 20M is asserted, not eyeballed.
  */
object ScaleStressGraph {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nComm = 100; val commSize = 1000
    val hub = 10000000L
    // expander-ish ring chords: diameter ~ a dozen hops under ±steps
    val offsets = Seq(1, 2, 5, 25, 125)
    val nodes = spark.range(0L, nComm.toLong * commSize)
    val comm = nodes
      .select(col("id"), (col("id") / commSize).cast("long").as("c"),
        (col("id") % commSize).as("i"))
    val intra = comm.select(col("id").as("src"),
        explode(array(offsets.map(o =>
          col("c") * commSize + (col("i") + o) % commSize): _*)).as("dst"))
    val hubEdges = nodes.select(lit(hub).as("src"), col("id").as("dst"))
    val edges = intra.union(hubEdges)
    println(s"[stress] graph: ${nComm * commSize} nodes + 1 hub, " +
      s"${edges.count()} directed edge rows")

    // -- 1. link prediction with the planted hub ---------------------------
    val preds = timed("linkPredict (hub gated at 1000)") {
      val p = Graphs.linkPredict(edges, maxWedgeDegree = 1000)
        .localCheckpoint(true)
      p.count(); p
    }
    val nPred = preds.count()
    val crossComm = preds.filter(
      (col("u") < hub) && (col("v") < hub) &&
        expr(s"u div $commSize") =!= expr(s"v div $commSize")).count()
    val viaHubOnly = preds.filter(col("u") === hub || col("v") === hub).count()
    println(s"[stress] predictions: $nPred; cross-community (want 0): " +
      s"$crossComm; involving hub (want 0 as wedge products exist only " +
      s"via gated centers): $viaHubOnly")

    // -- 2. clamped LPA: degree-gated graph recovers; raw hub graph poisons
    val seeds = spark.range(0, nComm)
      .select((col("id") * commSize).as("id"), col("id").as("label"))
    val labelsClean = timed("labelPropagate (12 rounds, hub gated out)") {
      val l = Graphs.labelPropagate(intra, seeds, iters = 12)
        .localCheckpoint(true)
      l.count(); l
    }
    val mislabeled = labelsClean
      .filter(col("label").isNull ||
        col("label") =!= expr(s"id div $commSize")).count()
    val labelsPoisoned = timed("labelPropagate (12 rounds, raw hub graph)") {
      val l = Graphs.labelPropagate(edges, seeds, iters = 12)
        .localCheckpoint(true)
      l.count(); l
    }
    val poisoned = labelsPoisoned.filter(col("id") =!= hub)
      .filter(col("label").isNull ||
        col("label") =!= expr(s"id div $commSize")).count()
    val hubLabel = labelsPoisoned.filter(col("id") === hub)
      .collect().head.getLong(1)
    println(s"[stress] gated graph mislabeled (want 0): $mislabeled; " +
      s"raw hub graph poisoned nodes (want >0 — the documented hazard): " +
      s"$poisoned; hub round-1 tie-break label (want 0): $hubLabel")

    // -- 3. closed-form KS / W1 at 20M rows ---------------------------------
    val domain = 50000L; val shift = 5000L
    val big = spark.range(0L, 10000000L)
      .select(lit("a").as("g"), (col("id") % domain).as("v"))
      .union(spark.range(0L, 10000000L)
        .select(lit("b").as("g"), (col("id") % domain + shift).as("v")))
    val ks = timed("ksTest over 20M rows") {
      Stats.ksTest(big, "g", "v", "a", "b").collect().head
    }
    val w1 = timed("wasserstein1 over 20M rows") {
      Stats.wasserstein1(big, "g", "v", "a", "b").collect().head
    }
    println(s"[stress] KS d_ppm (want ${1000000 * shift / domain}): " +
      s"${ks.getAs[Long]("d_ppm")}; W1 (want $shift.0): " +
      s"${w1.getAs[Double]("w1")}")

    val ok = crossComm == 0 && viaHubOnly == 0 && nPred > 0 &&
      mislabeled == 0 && poisoned > 0 && hubLabel == 0L &&
      ks.getAs[Long]("d_ppm") == 1000000 * shift / domain &&
      w1.getAs[Double]("w1") == shift.toDouble
    println(s"[stress] GRAPH/STATS ${if (ok) "PASS" else "FAIL"}")
    if (!ok) sys.exit(1)
  }
}
