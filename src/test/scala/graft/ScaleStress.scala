package graft

import org.apache.spark.sql.functions._

/** Dedup-tier scale stress (not a test): sbt "Test/runMain graft.ScaleStress"
  *
  * Builds a 10× documents corpus (50k docs from sf0.1's 5k) with CONTROLLED
  * duplicate mass, then runs the three pair-generating dedup paths that had
  * only ever seen 5k docs — minhashDedupExact (q23), paragraphDedup (q54),
  * minhashJoin (q64 idiom) — and checks recall on the constructed
  * duplicates, so cap-driven loss would be visible, not silent.
  *
  * Corpus construction per replica r in 0..9 (ids offset by r*1M):
  *   - doc_id % 10 == 0: EXACT copy of the original text (10-way exact
  *     groups — the mass-duplicate shape the exact pre-pass must collapse);
  *   - doc_id % 10 == 1: NEAR-dup — original text with one appended token
  *     unique per replica (Jaccard ≥ ~0.9 on these ~50-token docs; the LSH
  *     banding + exact-rescore tier must catch all 10 into one component);
  *   - otherwise: fully synthetic replica-unique token sequence (disjoint
  *     shingle sets) ⇒ NOT a duplicate of anything, must ALL survive.
  */
object ScaleStress {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** The ×10 mass-duplicated corpus: per base doc, one exact-copy group
    * (%10==0), one near-dup group (%10==1, per-replica tail), and 8
    * replica-unique synthetic docs. Returns (base, corpus, nDocs).
    */
  def corpusOf(spark: org.apache.spark.sql.SparkSession, dir: String,
               nReplicas: Int = 10)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Long) = {
    import spark.implicits._
    val base = Tables(spark, dir, "documents").select("doc_id", "text")
    val nBase = base.count()
    val replicas = spark.range(0, nReplicas).toDF("r")
    val corpus = base.crossJoin(replicas)
      .select(
        (col("doc_id") + col("r") * 1000000L).as("doc_id"),
        when(col("doc_id") % 10 === 0, col("text"))
          .when(col("doc_id") % 10 === 1,
            concat(col("text"), lit(" xtail"), col("r")))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(30)),
            i => concat(lit("t"), col("r"), lit("_"), col("doc_id"),
              lit("_"), i))))
          .as("text"),
        col("doc_id").as("base_id"), col("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    println(s"[stress] corpus: $n docs (${nBase}×$nReplicas)")
    (base, corpus, n)
  }

  /** q23 tier: exact pre-pass + LSH banding + exact rescore + CC, with
    * structural recall checks. Returns (lostExact, lostNear, uniques,
    * expectedUniques) — all-zero-loss means every constructed 10-group
    * collapsed to exactly its min-id member and nothing unique merged.
    */
  def dedupRecall(corpus: org.apache.spark.sql.DataFrame, label: String)
      : (Long, Long, Long, Long) = {
    val survivors = time(s"minhashDedupExact ($label)")(
      operators.Dedup.minhashDedupExact(corpus.select("doc_id", "text"),
        "text", "doc_id").persist())
    val nSurv = survivors.count()
    println(s"[stress] survivors: $nSurv")
    // Recall on constructed duplicates: each exact 10-group and each
    // near-dup 10-group must keep exactly its min-id member; survivors
    // from those groups with r > 0 would mean cap/recall loss.
    val lostExact = survivors.filter(col("doc_id") % 10 === 0 &&
      col("doc_id") >= 1000000L).count()
    val lostNear = survivors.filter(col("doc_id") % 10 === 1 &&
      col("doc_id") >= 1000000L).count()
    // Replica-unique docs must ALL survive (no false merges):
    val uniques = survivors.filter(col("doc_id") % 10 >= 2).count()
    val expectedUniques = corpus.filter(col("doc_id") % 10 >= 2).count()
    survivors.unpersist(blocking = false)
    println(s"[stress] exact-group extra survivors (want 0): $lostExact")
    println(s"[stress] near-dup extra survivors   (want 0): $lostNear")
    println(s"[stress] unique survivors: $uniques / $expectedUniques")
    (lostExact, lostNear, uniques, expectedUniques)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    val (base, corpus, n) = corpusOf(spark, dir)
    val (lostExact, lostNear, uniques, expectedUniques) =
      dedupRecall(corpus, "50k docs")

    // ---- q54 path: paragraph dedup at 50k docs ----
    val paras = time("paragraphDedup (50k docs)")(
      operators.Dedup.paragraphDedup(
        corpus.select(col("doc_id"),
          concat_ws("\n\n", col("text"), col("text")).as("text")),
        "text", "doc_id").count())
    println(s"[stress] paragraphDedup output docs: $paras")

    // ---- q64 path: cross-relation fuzzy join, 50k × 5k ----
    val joined = time("minhashJoin (50k × 5k)")(
      operators.Dedup.minhashJoin(
        corpus.select(col("doc_id").as("id_a"), col("text").as("text_a")),
        "text_a", "id_a",
        base.select(col("doc_id").as("id_b"), col("text").as("text_b")),
        "text_b", "id_b", threshold = 0.7).count())
    println(s"[stress] fuzzy-join pairs: $joined")

    // ---- q72 path: exact-substring dedup at 50k docs ----
    // exact-copy replicas (r > 0, %10 == 0) share every 5-gram with the
    // r = 0 original ⇒ fully covered ⇒ REMOVED; replica-unique docs have
    // globally unique tokens ⇒ survive with zero drops.
    val (span, spanN) = time("substringDedup (50k docs)") {
      val s = operators.Dedup.substringDedup(corpus.select("doc_id", "text"),
        "text", "doc_id", k = 5).persist()
      (s, s.count()) // force execution inside the timed block
    }
    val exactReplicasLeft = span.filter(col("doc_id") % 10 === 0 &&
      col("doc_id") >= 1000000L).count()
    val uniqueDropped = span.filter(col("doc_id") % 10 >= 2 &&
      col("n_toks_dropped") > 0).count()
    println(s"[stress] substringDedup output docs: $spanN")
    println(s"[stress] exact replicas left (want 0): $exactReplicasLeft")
    println(s"[stress] unique docs with drops (want 0): $uniqueDropped")
    span.unpersist(blocking = false)

    // ---- hot-doc scrub: ONE 200k-token doc, 99.5% repeated ----
    // the shape that stalled the pre-kernel O(tokens × covered)
    // reassembly (~4e10 probes in one task); the merge walk is O(400k)
    val hot = Seq((1L,
      Iterator.continually((1 to 1000).map(i => s"w$i").mkString(" "))
        .take(200).mkString(" "))).toDF("doc_id", "text")
    val hotRow = time("repeatedNgramScrub (1 doc × 200k tokens)")(
      operators.Dedup.repeatedNgramScrub(hot, "text", "doc_id", n = 2)
        .collect().head)
    println(s"[stress] hot doc kept ${hotRow.getLong(2)} " +
      s"dropped ${hotRow.getLong(3)} (want kept ≈ 1001)")

    // ---- r7 corpus-stats tier at 10×: PMI, bigram-NLL, temperature mix,
    // incremental decontamination refresh ----
    val nPmi = time("pmiBigrams (50k docs)")(
      operators.Relevance.pmiTopK(corpus, "text", k = 20, minCount = 5).count())
    val nNll = time("bigramNll (50k docs)")(
      operators.LmScore.bigramNll(corpus, "text", "doc_id").count())
    val nMix = time("temperatureMixture (50k docs)")(
      operators.Sampling.temperatureMixture(
        corpus.withColumn("src", pmod(col("doc_id"), lit(20)).cast("string")),
        "src", "doc_id", alpha = 0.5, budgetRows = 5000L).count())
    val deconRoot = java.nio.file.Files.createTempDirectory("stress_decon").toString
    val benchT = storage.VersionedTable(spark, s"$deconRoot/bench",
      collectStats = false)
    val nDecon = time("incrementalDecontaminate (5k bench, 50k corpus)") {
      benchT.append(corpus.filter(col("doc_id") % 10 === 2)
        .select(col("doc_id"), col("text")))
      val idx = operators.IncrementalDecontaminate(spark, benchT,
        s"$deconRoot/state", "text", n = 8)
      idx.refresh()
      idx.contaminatedIds(corpus, "doc_id", "text").count()
    }
    println(s"[stress] pmi=$nPmi nll=$nNll mix=$nMix decon=$nDecon")
    // the benchmark docs themselves must all flag (they share all grams)
    val nBench = corpus.filter(col("doc_id") % 10 === 2).count()

    // ---- late-r7 tier: quality gate, incremental BM25, incr. quantiles ----
    // quality filter is map-only: 50k docs in scan time; replica-unique
    // docs (synthetic t<r>_<id>_<i> tokens) carry no stoplist word ⇒ fail
    // stopword_hits, every original-text doc keeps its sf0.1 verdict.
    val nQf = time("qualityFilter (50k docs)")(
      operators.QualityFilter.keep(corpus, "text",
        operators.QualityFilter.Config(minWords = 10)).count())
    println(s"[stress] quality survivors: $nQf")

    // incremental BM25: 45k-doc base index + one 5k-doc delta refresh —
    // the refresh must cost delta time, not corpus time; scoring reads
    // postings only.
    val bm25Root = java.nio.file.Files.createTempDirectory("stress_bm25").toString
    val bmSrc = storage.VersionedTable(spark, s"$bm25Root/src",
      collectStats = false)
    val bmIdx = operators.IncrementalRelevance(spark, bmSrc, s"$bm25Root/idx",
      "text", "doc_id", layoutPartitions = 8)
    time("incrementalBm25 base build (45k docs)") {
      bmSrc.append(corpus.filter(col("r") < 9).select("doc_id", "text"))
      bmIdx.refresh()
    }
    time("incrementalBm25 delta refresh (5k docs)") {
      bmSrc.append(corpus.filter(col("r") === 9).select("doc_id", "text"))
      bmIdx.refresh()
    }
    val nBm = time("incrementalBm25 score (postings only)")(
      bmIdx.scoreTopK(Seq("table", "join", "stream"), 10).count())

    // incremental quantiles: histogram folds 50k rows into ≤ ~1k buckets
    val qRoot = java.nio.file.Files.createTempDirectory("stress_quant").toString
    val qSrc = storage.VersionedTable(spark, s"$qRoot/src", collectStats = false)
    val iq = operators.IncrementalQuantiles(spark, qSrc, s"$qRoot/state",
      Seq("g"), floor(col("v") * 10) / 10)
    val nQBuckets = time("incrementalQuantiles (50k rows + delete window)") {
      qSrc.append(corpus.select(pmod(col("doc_id"), lit(5)).cast("string").as("g"),
        (col("doc_id") % 1000).cast("double").as("v"), col("doc_id")))
      iq.refresh()
      qSrc.deleteWhere(col("doc_id") % 17 === 0)
      iq.refresh()
      iq.histogram.count()
    }
    val nQuant = iq.quantiles(Seq(0.5, 0.99)).count()
    println(s"[stress] bm25 top=$nBm quantile buckets=$nQBuckets rows=$nQuant")

    // ---- selection tier: quantile buckets / budget cap / leakage split ----
    // 50k docs: bucketing must stay histogram-shaped (no corpus sort),
    // every (lang, bucket) populated; budget cap keeps the greedy prefix
    // under the quota in every source; the leakage split must keep all
    // 10-way replica groups atomic (the corpus IS mass-duplicated).
    val scoredT = corpus.select(col("doc_id"),
      concat(lit("l"), pmod(col("base_id"), lit(5))).as("lang"),
      concat(lit("s"), pmod(col("base_id"), lit(20))).as("source"),
      functions.TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    // mass duplication can collapse a group's terciles (t1 = t2 leaves
    // "middle" empty) — the invariants are exhaustive assignment and at
    // least one populated bucket per lang, not always 3
    val bucketed = time("quantileBuckets (50k docs)")(
      operators.Selection.quantileBuckets(scoredT, "lang", "tok",
        Seq(1 -> 3, 2 -> 3), Seq("head", "middle", "tail"))
        .groupBy("lang", "bucket").count().collect())
    val nAssigned = bucketed.map(_.getLong(2)).sum
    val nLangs = bucketed.map(_.getString(0)).distinct.length
    val capped = time("budgetCap (50k docs)")(
      operators.Selection.budgetCap(scoredT, "source", "tok", "doc_id",
        "tok", budget = 5000L)
        .groupBy("source").agg(max(col("_cum")).as("used")))
    val overBudget = capped.filter(col("used") > 5000L).count()
    val splitDf = time("leakageSafeSplit (50k docs, mass dups)")(
      operators.Sampling.leakageSafeSplit(corpus.select("doc_id", "text"),
        "text", "doc_id", Seq("train" -> 0.9, "val" -> 0.1)))
    val straddle = splitDf.groupBy("grp")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    println(s"[stress] assigned=$nAssigned langs=$nLangs " +
      s"overBudget=$overBudget straddlers=$straddle")

    // ---- graph tier: star contraction at adversarial depth ----
    // ONE 100k-link chain (diameter 100k: min-label would need 100k
    // shuffle rounds) + 1k random 50-node communities. Star contraction
    // must resolve everything inside the 50-round budget, exactly.
    val chainN = 100000L
    val chain = spark.range(0, chainN)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // 1000 communities of 50 nodes, 50 deterministic edges each; the
    // union-find ground truth of this construction is exactly 5000
    // components (each community decomposes into 5 cycles)
    val g = pmod(col("id"), lit(1000))
    val k = (col("id") / 1000).cast("long")
    val comm = spark.range(0, 50000)
      .select((g * 1000000L + 1000000000L + (k * 17L + g) % 50).as("id_a"),
        (g * 1000000L + 1000000000L + (k * 29L + g * 3L + 1L) % 50).as("id_b"))
    val labels = time("starComponents (100k-link chain + 1k communities)")(
      operators.Dedup.starComponents(chain.union(comm)).cache())
    val chainComp = labels.filter(col("id") <= chainN)
      .select(countDistinct(col("component"))).head.getLong(0)
    val commComps = labels.filter(col("id") >= 1000000000L)
      .select(countDistinct(col("component"))).head.getLong(0)
    println(s"[stress] chain components (want 1): $chainComp; " +
      s"community components: $commComps")
    labels.unpersist(blocking = false)

    // weighted sample over the 50k corpus: k exact, deterministic
    val ws = time("weightedSample k=5000 (50k docs)")(
      operators.Sampling.weightedSample(scoredT, "doc_id", col("tok"), 5000)
        .count())

    // incremental CC: a 20k-link chain arriving as 4 appends — every
    // refresh merges a new segment INTO the existing giant component
    // (the frontier-touching worst case: members ∪ delta grows each
    // round); final assignment must be ONE component, delta-refreshes only
    val incRoot = java.nio.file.Files.createTempDirectory("stress_inccc").toString
    val incSrc = graft.storage.VersionedTable(spark, s"$incRoot/src",
      collectStats = false)
    val incCc = operators.IncrementalComponents(spark, incSrc, s"$incRoot/state")
    time("incremental CC (20k chain, 4 deltas)") {
      (0 until 4).foreach { b =>
        incSrc.append(chain
          .filter(col("id_a") >= b * 5000L && col("id_a") < (b + 1) * 5000L))
        require(incCc.refresh() == 1L, "delta-only refresh")
      }
    }
    val incComps = incCc.read.select(countDistinct(col("component")))
      .head.getLong(0)
    println(s"[stress] incremental chain components (want 1): $incComps")

    val ok = chainComp == 1 && commComps == 5000 && ws == 5000 &&
      incComps == 1 &&
      lostExact == 0 && lostNear == 0 && uniques == expectedUniques &&
      exactReplicasLeft == 0 && uniqueDropped == 0 &&
      hotRow.getLong(2) < 1100 &&
      nPmi == 20 && nNll >= n * 8 / 10 && nDecon >= nBench &&
      nQf > 0 && nQf < n && nBm == 10 &&
      nQBuckets <= 5005 && nQuant == 10 &&
      nAssigned == n && nLangs == 5 && overBudget == 0 && straddle == 0
    println(s"[stress] RECALL ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

/** The q23 dedup tier ALONE at the next scale step: ×10 of whatever the
  * dir holds — point it at an sf1 copy (50k base docs) for the 500k-doc
  * pressure run that exercises the 512/band bucket caps and the
  * star-contraction path end-to-end. Zero recall loss is the gate, same
  * structural checks as [[ScaleStress]].
  */
object ScaleStressDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReplicas = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val (_, corpus, n) = ScaleStress.corpusOf(spark, dir, nReplicas)
    val (lostExact, lostNear, uniques, expectedUniques) =
      ScaleStress.dedupRecall(corpus, s"$n docs")
    val ok = lostExact == 0 && lostNear == 0 && uniques == expectedUniques
    println(s"[stress] RECALL ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
