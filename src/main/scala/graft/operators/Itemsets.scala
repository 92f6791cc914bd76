package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-Priori frequent-itemset mining, specialized to the 3-itemset tier
  * (1- and 2-itemsets are q06/q132-style grouped counts; triples are
  * where naive enumeration explodes and the A-Priori downward-closure
  * prune earns its keep): a triple can only be frequent if ALL THREE of
  * its pairs are, so baskets enumerate only pair-supported triples.
  *
  * Scale shape: items below support leave before any pair work
  * (broadcast semi-join); frequent pairs are a within-basket self-join
  * with map-side combine; candidate triples join F2⋈F2 on the leading
  * item with the third pair checked by one more semi-join — all
  * item-domain-sized. The basket-level triple count enumerates a<b<c
  * only over PAIR-FREQUENT in-basket pairs, the classical candidate
  * restriction. `maxBasketItems` hard-bounds the per-basket fanout (a
  * pathological mega-basket contributes k³ triples); CAPPED BASKETS ARE
  * EXCLUDED FROM ALL PAIR AND TRIPLE SUPPORT COUNTS — supports deflate
  * by exactly those baskets' contributions, so audit them with
  * [[cappedBaskets]] (the same relation this operator excludes) and
  * route them to review before trusting thresholds near the cap.
  *
  * The within-basket pair enumeration — the expensive closure subtree —
  * is materialized ONCE (durable scratch parquet when `scratchDir` is
  * set, the cluster-scale path; an eager local checkpoint otherwise):
  * it feeds the F2 count, the candidate build, and both sides of the
  * triple self-join, and without the cut Spark re-derives it per
  * consumer unless exchange reuse happens to fire.
  */
object Itemsets {

  /** Baskets `frequentTriples` would exclude at this cap, as
    * `(basket, n_items)` — n_items counted over the basket's DISTINCT
    * items, the same granularity the cap is enforced at. Emit/persist
    * this alongside the mined triples: it is the operator's honesty
    * relation (the [[Robots.parseRules]] `n_wildcard` posture).
    */
  def cappedBaskets(df: DataFrame, basketCol: String, itemCol: String,
                    maxBasketItems: Int = 1000): DataFrame =
    df.select(col(basketCol).as("basket"), col(itemCol).as("i"))
      .filter(col("basket").isNotNull && col("i").isNotNull)
      .distinct()
      .groupBy(col("basket")).agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > maxBasketItems)

  /** Frequent triples with absolute support `minSupport`: one row per
    * (item_a < item_b < item_c) with `support` ≥ minSupport.
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long, maxBasketItems: Int = 1000,
                      scratchDir: Option[String] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val f1 = baskets.groupBy(col("i")).agg(count(lit(1)).as("_s"))
      .filter(col("_s") >= minSupport).select(col("i"))
    val pruned = baskets.join(broadcast(f1), Seq("i"))
      .select(col("b"), col("i"))
    val small = pruned.groupBy(col("b")).agg(count(lit(1)).as("_k"))
      .filter(col("_k") <= maxBasketItems).select(col("b"))
    val kept = pruned.join(small, Seq("b"))
    // within-basket pair enumeration — computed ONCE (see scaladoc): it
    // has three consumers (F2, candidates, triple self-join v-side)
    val pairs = materialize(
      kept.as("x").join(kept.as("y"), expr("x.b = y.b AND x.i < y.i"))
        .select(expr("x.b").as("b"), expr("x.i").as("p"), expr("y.i").as("q")),
      scratchDir, "pairs")
    val f2 = pairs.groupBy(col("p"), col("q")).agg(count(lit(1)).as("_s"))
      .filter(col("_s") >= minSupport).select(col("p"), col("q"))
    // per-basket triples over pair-frequent in-basket pairs: (a,b) and
    // (a,c) frequent with b < c, and (b,c) frequent (downward closure)
    val bp = materialize(pairs.join(broadcast(f2), Seq("p", "q")),
      scratchDir, "bp")
    val tri = bp.as("u").join(bp.as("v"),
        expr("u.b = v.b AND u.p = v.p AND u.q < v.q"))
      .select(expr("u.b").as("b"), expr("u.p").as("a"),
        expr("u.q").as("bb"), expr("v.q").as("c"))
      .join(broadcast(f2.select(col("p").as("bb"), col("q").as("c"))),
        Seq("bb", "c"))
    tri.groupBy(col("a").as("item_a"), col("bb").as("item_b"),
        col("c").as("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Cut lineage on a multiply-consumed relation: durable parquet scratch
    * (survives executor loss — the cluster path, q114's `scratchDir`
    * contract) or an eager local checkpoint (local/bench path).
    */
  private def materialize(df: DataFrame, scratchDir: Option[String],
                          tag: String): DataFrame = scratchDir match {
    case Some(dir) =>
      val path = s"$dir/itemsets_$tag"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    case None => df.localCheckpoint(true)
  }
}
