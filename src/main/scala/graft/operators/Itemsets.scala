package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-Priori frequent-itemset mining, specialized to the 3-itemset tier
  * (1- and 2-itemsets are q06/q132-style grouped counts; triples are
  * where naive enumeration explodes and the A-Priori downward-closure
  * prune earns its keep): a triple can only be frequent if ALL THREE of
  * its pairs are, so baskets enumerate only pair-supported triples.
  *
  * Scale shape: items below support leave before any per-basket work
  * (broadcast semi-join), then each basket collapses to ONE row holding
  * its sorted item array — the basket-count-sized relation every later
  * stage pipelines from, materialized once (durable scratch parquet when
  * `scratchDir` is set, the cluster-scale path; an eager local
  * checkpoint otherwise). Pairs and candidate triples are nested
  * position-sliced explodes over that array — codegen'd generates, no
  * within-basket self-join, no shuffle between generation and the
  * map-side-combined support count (the partial agg collapses each
  * task's candidate stream to the itemset domain before anything moves).
  * Downward closure runs as three broadcast probes of F2 — (a,b) BEFORE
  * the third element is generated (the prune that bounds the k³ blowup),
  * (a,c) and (b,c) after.
  *
  * `maxBasketItems` hard-bounds the per-basket fanout (a pathological
  * mega-basket contributes k³ triples); CAPPED BASKETS ARE EXCLUDED FROM
  * ALL PAIR AND TRIPLE SUPPORT COUNTS — supports deflate by exactly
  * those baskets' contributions, so audit them with [[cappedBaskets]]
  * (the same relation this operator excludes) and route them to review
  * before trusting thresholds near the cap.
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
    * (item_a < item_b < item_c) with `support` ≥ minSupport. Item order
    * is the column type's own ordering (binary string order for string
    * items — the same `<` the SQL tier uses).
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long, maxBasketItems: Int = 1000,
                      scratchDir: Option[String] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    // dictionary-encode the FREQUENT-item domain to dense ints whose
    // order mirrors the item order (row_number over the item sort), so
    // every hot-path compare/hash below runs on ints, not strings — the
    // candidate stream is |baskets|·k³-sized and string hashing was the
    // measured bottleneck. The unpartitioned window buffers only the
    // support-bounded frequent-item domain (the paretoFront posture).
    val f1 = baskets.groupBy(col("i")).agg(count(lit(1)).as("_s"))
      .filter(col("_s") >= minSupport).select(col("i"))
    val dict = materialize(
      f1.withColumn("code", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("i")))),
      scratchDir, "dict")
    val kept = baskets.join(broadcast(dict), Seq("i"))
      .select(col("b"), col("code"))
    // one sorted item-code array per basket — the cap applies to the
    // F1-pruned basket (a basket can only explode through items that
    // survive the support prune). This relation is basket-count-sized
    // and every downstream stage pipelines from it: cut lineage HERE.
    val arrs = materialize(
      kept.groupBy(col("b"))
        .agg(sort_array(collect_list(col("code"))).as("arr"))
        .filter(size(col("arr")) <= maxBasketItems)
        .select(col("arr")),
      scratchDir, "arrs")
    // in-basket pairs: nested position-sliced explodes (a before b in
    // array order), partial-agg'd to the pair domain per task
    val pairRows = arrs
      .select(col("arr"), posexplode(col("arr")).as(Seq("ia", "a")))
      .select(col("arr"), col("ia"), col("a"),
        posexplode(expr("slice(arr, ia + 2, size(arr))")).as(Seq("jb", "p2")))
    // F2 is probed by THREE broadcasts below whose projections differ, so
    // exchange reuse cannot dedup them — materialize the (tiny) frequent
    // pair set once instead of re-aggregating the pair stream per probe
    val f2 = materialize(
      pairRows.groupBy(col("a").as("p"), col("p2").as("q"))
        .agg(count(lit(1)).as("_s"))
        .filter(col("_s") >= minSupport).select(col("p"), col("q")),
      scratchDir, "f2")
    // candidate triples: prune (a,b) against F2 BEFORE generating c from
    // the array tail, then check (b,c) and (a,c) — full downward closure
    val tri = pairRows
      .join(broadcast(f2),
        col("a") === col("p") && col("p2") === col("q"))
      .select(col("arr"), col("a"), col("p2").as("bb"),
        (col("ia") + col("jb") + lit(3)).as("ic"))
      .select(col("a"), col("bb"),
        explode(expr("slice(arr, ic, size(arr))")).as("c"))
      .join(broadcast(f2.select(col("p").as("bb"), col("q").as("c"))),
        Seq("bb", "c"))
      .join(broadcast(f2.select(col("p").as("a"), col("q").as("c"))),
        Seq("a", "c"))
    val counts = tri.groupBy(col("a"), col("bb"), col("c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    // decode the (domain-sized) result back to item values
    counts
      .join(broadcast(dict.select(col("code").as("a"), col("i").as("item_a"))),
        Seq("a"))
      .join(broadcast(dict.select(col("code").as("bb"), col("i").as("item_b"))),
        Seq("bb"))
      .join(broadcast(dict.select(col("code").as("c"), col("i").as("item_c"))),
        Seq("c"))
      .select(col("item_a"), col("item_b"), col("item_c"), col("support"))
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
