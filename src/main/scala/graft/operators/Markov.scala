package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov analysis of event sequences — "what follows what":
  * the transition matrix of a state column along each key's ordered
  * stream, and the chain's stationary distribution (long-run share of
  * time in each state), the summary pair behind session-flow dashboards,
  * next-event baselines, and behavioral drift monitors.
  *
  * Determinism discipline: transition counts are integers; probabilities
  * are exact `ppm = n·10⁶ div row_total`; the stationary distribution is
  * a fixed-round power iteration in SCALED INTEGER arithmetic (the
  * [[PageRank]] contract — float mass sums would be order-dependent,
  * integer floors are not), so every output is SQL-oracle-provable.
  */
object Markov {

  /** Transition counts + exact ppm row-probabilities of `stateCol` along
    * each key's stream ordered by `orderCols`: one row per observed
    * `(from_state, to_state)` with `n, out_total, p_ppm`. Self-loops
    * count like any transition; the last event of a key emits nothing.
    *
    * Scale shape: ONE key-partitioned window (the lag) + one grouped
    * count; output is state-domain² -sized.
    */
  def transitions(df: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], stateCol: String): DataFrame = {
    require(keyCols.nonEmpty, "transitions requires key columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val pairs = df
      .select(keyCols.map(col) :+ col(stateCol).as("_s") :+
        lag(col(stateCol), 1).over(w).as("_p"): _*)
      .filter(col("_p").isNotNull && col("_s").isNotNull)
    val counts = pairs.groupBy(col("_p").as("from_state"),
        col("_s").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val outTotals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("out_total"))
    counts.join(outTotals, "from_state")
      .select(col("from_state"), col("to_state"), col("n"), col("out_total"),
        expr("n * 1000000 div out_total").as("p_ppm"))
  }

  /** Stationary distribution of the transition matrix by `iters` rounds
    * of scaled-integer power iteration: starting from the uniform vector
    * (`scale` per state),
    *
    *   π'(s) = Σ_t (π(t) · n(t→s)) div out(t)        [integer floor]
    *
    * — every round exact and order-independent. States with no outgoing
    * transitions leak their mass (the absorbing-sink caveat of any
    * power iteration; feed a recurrent chain or add a restart upstream).
    * Returns `(state, pi)` with π at `scale`.
    *
    * Scale shape: the transition matrix is state-domain²-sized, so each
    * round is a broadcast-sized join + grouped sum.
    */
  def scaledStationary(trans: DataFrame, iters: Int,
                       scale: Long = 1000000000L,
                       driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(driverEdgeLimit <= PageRank.driverEdgeCeiling,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver " +
        "power-iteration ceiling; larger matrices take the distributed " +
        "path (lower driverEdgeLimit instead of raising it)")
    val t = trans.select(col("from_state").as("_f"), col("to_state").as("_t"),
      col("n").cast("long").as("_n"), col("out_total").cast("long").as("_o"))
      .localCheckpoint(true)
    // DRIVER power iteration under the matrix-entry ceiling (the
    // [[PageRank]] precedent): the transition matrix is state-domain²
    // bounded, each round is a synchronous barrier, and the scaled-integer
    // arithmetic is order-independent — both paths bit-identical
    // (spec-pinned)
    if (t.count() <= DriverPath.effective(driverEdgeLimit)) {
      val spark = t.sparkSession
      // states are whatever type the caller's state column carries —
      // boxed values key the maps and re-enter through an explicit schema
      val es = t.collect()
        .map(r => (r.get(0), r.get(1), r.getLong(2), r.getLong(3)))
      val states = new java.util.LinkedHashSet[Any]()
      es.foreach { case (f, tt, _, _) => states.add(f); states.add(tt) }
      var pi = new java.util.HashMap[Any, Long]()
      states.forEach { s => pi.put(s, scale); () }
      var i = 0
      while (i < iters) {
        val next = new java.util.HashMap[Any, Long]()
        states.forEach { s => next.put(s, 0L); () }
        es.foreach { case (f, tt, n, o) =>
          next.merge(tt, pi.get(f) * n / o, _ + _)
        }
        pi = next
        i += 1
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      states.forEach { s =>
        rows.add(org.apache.spark.sql.Row(s, pi.get(s))); () }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("state",
          t.schema("_f").dataType),
        org.apache.spark.sql.types.StructField("pi",
          org.apache.spark.sql.types.LongType, nullable = false)))
      return spark.createDataFrame(rows, schema)
    }
    val states = t.select(col("_f").as("state"))
      .union(t.select(col("_t"))).distinct().localCheckpoint(true)
    var pi = states.withColumn("pi", lit(scale))
    var i = 0
    while (i < iters) {
      val contrib = pi.join(t, pi("state") === t("_f"))
        .select(col("_t").as("state"),
          expr("(pi * _n) div _o").as("_c"))
      pi = states
        .join(contrib.groupBy(col("state")).agg(sum(col("_c")).as("_in")),
          Seq("state"), "left")
        .select(col("state"), coalesce(col("_in"), lit(0L)).as("pi"))
      if ((i + 1) % 5 == 0 && i + 1 < iters) pi = pi.localCheckpoint(true)
      i += 1
    }
    pi
  }
}
