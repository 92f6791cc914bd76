package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * F1 (the item dictionary) and F2 (the frequent pairs) are COLLECTED TO
  * THE DRIVER and re-enter the plan as local relations: both were always
  * broadcast-bound (the dict feeds four broadcast probes, F2 three, so
  * their size ceiling IS the broadcast ceiling — `maxBroadcastItemsets`
  * fails loud past it), and a local relation broadcasts from driver
  * memory directly, where a distributed one costs a window/checkpoint
  * job to build plus one broadcast-exchange job PER PROBE (exchange
  * reuse cannot dedup them — the probes project different columns).
  * Measured at sf0.1 this removed ~7 fixed job barriers from the chain.
  *
  * ADAPTIVE: when the frequent-item domain is small enough that every
  * candidate triple fits a map-side hash agg (|F1|³/6 ≤
  * `maxDirectTriples`), the operator skips the F2 pass and its probe
  * joins entirely and counts all in-basket triples in one explode
  * cascade — same results (downward closure is purely a performance
  * device), one job instead of a four-stage chain. The A-Priori path
  * remains the large-domain default.
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
    *
    * SCRATCH LIFETIME: with `scratchDir` set, the basket-array relation
    * persists as parquet under `scratchDir/itemsets_arrs` and the
    * RETURNED FRAME READS IT LAZILY — the files must outlive every
    * consumption of the result. Re-runs into the same dir overwrite in
    * place (no unbounded growth); when the result is fully consumed,
    * reclaim the dir with [[cleanupScratch]].
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long, maxBasketItems: Int = 1000,
                      scratchDir: Option[String] = None,
                      maxBroadcastItemsets: Int = 4000000,
                      maxDirectTriples: Long = 100000): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val spark = df.sparkSession
    // deduped (basket, item) relation materialized ONCE: it feeds the F1
    // dictionary pass AND the basket-array build, and without the lineage
    // cut each of those actions re-ran the scan + distinct (measured: a
    // duplicated 0.45–0.55 s single-straggler job per rep at sf0.1). Same
    // durable-scratch/local-checkpoint split as `arrs` below.
    val baskets = materialize(
      df.select(col(basketCol).as("b"), col(itemCol).as("i"))
        .filter(col("b").isNotNull && col("i").isNotNull)
        .distinct(), scratchDir, "baskets")
    def emptyResult: DataFrame = baskets
      .select(col("i").as("item_a"), col("i").as("item_b"),
        col("i").as("item_c"), lit(0L).as("support"))
      .limit(0)
    // F1, dictionary-encoded to dense ints whose order mirrors the item
    // order (codes assigned along the Spark-side sort, so sorted CODE
    // arrays enumerate itemsets in ITEM order) — every hot-path
    // compare/hash below runs on ints, not strings: the candidate stream
    // is |baskets|·k³-sized and string hashing was the measured
    // bottleneck. Collected in one job, re-entering as a local relation.
    val f1Items = baskets.groupBy(col("i")).agg(count(lit(1)).as("_s"))
      .filter(col("_s") >= minSupport)
      .select(col("i")).orderBy(col("i")).collect()
    require(f1Items.length <= maxBroadcastItemsets,
      s"frequentTriples found ${f1Items.length} frequent items, past " +
        s"maxBroadcastItemsets=$maxBroadcastItemsets — the dictionary " +
        "feeds broadcast probes and must stay broadcast-sized; raise " +
        "minSupport (or the bound, if the cluster's driver can hold it)")
    if (f1Items.isEmpty) return emptyResult
    val itemType = baskets.schema("i").dataType
    val dictSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", itemType),
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val dictRows: java.util.List[Row] = java.util.Arrays.asList(
      f1Items.zipWithIndex.map { case (r, idx) => Row(r.get(0), idx + 1) }: _*)
    val dict = spark.createDataFrame(dictRows, dictSchema)
    val kept = baskets.join(broadcast(dict), Seq("i"))
      .select(col("b"), col("code"))
    // the array relation is COMPACT (ints, no basket key), so AQE
    // coalesces it to a handful of partitions — and then the k³ explode
    // cascade, the actual work, runs on that handful of cores while the
    // rest idle (measured: a single 0.4 s straggler task at sf0.1). The
    // round-robin respread is priced in bytes (tiny) but paid back in
    // explode parallelism; defaultParallelism keeps it scale-adaptive
    // (the q176 bootstrap precedent).
    def basketArrays: DataFrame = kept.groupBy(col("b"))
      .agg(sort_array(collect_list(col("code"))).as("arr"))
      .filter(size(col("arr")) <= maxBasketItems)
      .select(col("arr"))
      .repartition(spark.sparkContext.defaultParallelism)
    def decode(counts: DataFrame): DataFrame = counts
      .join(broadcast(dict.select(col("code").as("a"), col("i").as("item_a"))),
        Seq("a"))
      .join(broadcast(dict.select(col("code").as("bb"), col("i").as("item_b"))),
        Seq("bb"))
      .join(broadcast(dict.select(col("code").as("c"), col("i").as("item_c"))),
        Seq("c"))
      .select(col("item_a"), col("item_b"), col("item_c"), col("support"))
    // DIRECT PATH — small frequent-item domain: when every candidate
    // triple fits a map-side hash agg (|F1|³/6 ≤ maxDirectTriples), the
    // downward-closure machinery costs more than it saves (an extra
    // pair-count pass plus three probe joins, each a job barrier), so
    // count ALL in-basket triples in ONE explode cascade: the partial
    // agg collapses each task's candidate stream to the ≤maxDirectTriples
    // triple domain before the single exchange. Identical results — the
    // F2 prune is purely a performance device — and with one consumer
    // the basket-array relation needs no lineage cut at all.
    val nF1 = f1Items.length.toLong
    if (nF1 * (nF1 - 1) * (nF1 - 2) / 6 <= maxDirectTriples) {
      val triDirect = basketArrays
        .select(col("arr"), posexplode(col("arr")).as(Seq("ia", "a")))
        .select(col("arr"), col("ia"), col("a"),
          posexplode(expr("slice(arr, ia + 2, size(arr))")).as(Seq("jb", "bb")))
        .select(col("a"), col("bb"),
          explode(expr("slice(arr, ia + jb + 3, size(arr))")).as("c"))
      return decode(triDirect.groupBy(col("a"), col("bb"), col("c"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport))
    }
    // one sorted item-code array per basket — the cap applies to the
    // F1-pruned basket (a basket can only explode through items that
    // survive the support prune). This relation is basket-count-sized
    // and every downstream stage pipelines from it: cut lineage HERE.
    val arrs = materialize(basketArrays, scratchDir, "arrs")
    // in-basket pairs: nested position-sliced explodes (a before b in
    // array order), partial-agg'd to the pair domain per task
    def pairRows = arrs
      .select(col("arr"), posexplode(col("arr")).as(Seq("ia", "a")))
      .select(col("arr"), col("ia"), col("a"),
        posexplode(expr("slice(arr, ia + 2, size(arr))")).as(Seq("jb", "p2")))
    // F2 collected (one pass over the pair stream): the three
    // downward-closure probes below each broadcast it — local-relation
    // broadcasts cost no job
    val f2Pairs = pairRows.groupBy(col("a").as("p"), col("p2").as("q"))
      .agg(count(lit(1)).as("_s"))
      .filter(col("_s") >= minSupport).select(col("p"), col("q")).collect()
    require(f2Pairs.length <= maxBroadcastItemsets,
      s"frequentTriples found ${f2Pairs.length} frequent pairs, past " +
        s"maxBroadcastItemsets=$maxBroadcastItemsets — F2 feeds broadcast " +
        "probes and must stay broadcast-sized; raise minSupport")
    if (f2Pairs.isEmpty) return emptyResult
    val f2Schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val f2 = spark.createDataFrame(
      java.util.Arrays.asList(f2Pairs: _*), f2Schema)
    // candidate triples: prune (a,b) against F2 BEFORE generating c from
    // the array tail, then check (b,c) and (a,c) — full downward closure.
    // This is the pair stream's SECOND enumeration (the first fed F2);
    // re-generating from the materialized arrs beats persisting the pair
    // stream itself, which duplicates each basket's array per pair (k×
    // the arrs footprint) for a codegen'd explode that re-runs cheaper
    // than that storage ships.
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
    // decode the (domain-sized) result back to item values
    decode(tri.groupBy(col("a"), col("bb"), col("c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport))
  }

  /** Reclaim the scratch parquet a `scratchDir` run left behind. Call
    * only after the returned frame is fully consumed — the result reads
    * the scratch lazily.
    */
  def cleanupScratch(spark: org.apache.spark.sql.SparkSession,
                     scratchDir: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(scratchDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) {
      val victims = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "itemsets_*"))
      if (victims != null) victims.foreach(v => fs.delete(v.getPath, true))
    }
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
