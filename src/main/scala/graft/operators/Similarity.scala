package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.expressions.{cosineSimilarity, dotConst, pqAdcCol, pqEncodeCol}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), for training-data pipelines (retrieval, embedding
  * near-dup, clustering prep).
  *
  * Three tiers, trading recall for scan cost:
  *
  *  - `topK`: exact brute-force cosine top-k. One pass over the table with a
  *    fused dot-product expression and a `TakeOrderedAndProject` — no shuffle
  *    of the vectors themselves, only k rows reach the driver. At 100 TB this
  *    is the per-partition-scan baseline (and the recall oracle for the
  *    approximate tiers).
  *  - `lshTopK`: random-hyperplane LSH. Vectors bucket by an nbits sign
  *    signature; the query probes its own bucket plus all buckets within
  *    `probeHamming` bit flips. Scan cost drops to the probed buckets'
  *    partitions (a partition-pruned scan when the table is written
  *    partitioned/bucketed by `_lsh_bucket`).
  *  - IVF (`ivfAssign` + `ivfTopK`): inverted-file index with sampled
  *    k-means centroids. Build once (`fit` = driver-side Lloyd iterations on
  *    a bounded sample — the classic IVF coarse quantizer), assign each
  *    vector to its nearest centroid (broadcast centroids, one map pass),
  *    then queries scan only the `nprobe` nearest inverted lists.
  *
  * Near-duplicate detection by embedding cosine (`cosinePairs`) reuses the
  * LSH buckets to avoid the O(n²) cross join.
  */
object Similarity {

  /** Cosine scores against a constant query vector; computed in double
    * precision regardless of the stored float width.
    */
  def cosineScore(vec: Column, query: Array[Double]): Column = {
    val qnorm = math.sqrt(query.map(x => x * x).sum)
    val dot = dotConst(vec, query)
    val vnorm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(vnorm === 0d || lit(qnorm) === 0d, lit(0d))
      .otherwise(dot / (vnorm * lit(qnorm)))
  }

  /** Exact brute-force cosine top-k. */
  def topK(df: DataFrame, vecCol: String, idCol: String,
           query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineScore(col(vecCol), query).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Exact cosine top-k for a BATCH of query vectors — the
    * retrieval-pipeline shape (score a whole query set against the
    * corpus in one pass). `queries` is a bounded relation
    * `(qidCol, qvecCol: array<float>)`:
    *
    *  - queries broadcast; the corpus NEVER shuffles — each partition
    *    scores its rows against every query with the fused
    *    [[cosineSimilarity]] kernel;
    *  - the per-query rank filter plans as a map-side WindowGroupLimit,
    *    so only queries × k rows per mapper reach the one shuffle.
    */
  def topKBatch(df: DataFrame, vecCol: String, idCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains(qidCol) && !df.columns.contains(qvecCol),
      s"query columns ($qidCol, $qvecCol) must not collide with corpus " +
        s"columns ${df.columns.mkString(",")} — rename the query side, " +
        "e.g. .select(col(\"vec_id\").as(\"qid\"), col(\"embedding\").as(\"qvec\"))")
    val scored = df.crossJoin(broadcast(queries))
      .select(col(qidCol), col(idCol),
        cosineSimilarity(col(vecCol), col(qvecCol)).as("score"))
    scored
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(desc("score"), col(idCol))))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  // ---------------------------------------------------------------------
  // Random-hyperplane LSH
  // ---------------------------------------------------------------------

  /** Deterministic pseudo-random hyperplanes: component j of plane b is a
    * hash-derived value in [-1,1]. Same seed → same planes on every executor
    * and on the driver (needed to bucket the query vector identically).
    */
  private def plane(bit: Int, dim: Int, seed: Long): Array[Double] =
    Array.tabulate(dim) { j =>
      var h = seed ^ (bit * 0x9E3779B97F4A7C15L) ^ (j * 0xC2B2AE3D27D4EB4FL)
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
      (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    }

  /** Sign-signature column: bit b set iff vec · plane(b) > 0. */
  def lshSignature(vec: Column, dim: Int, nbits: Int, seed: Long): Column =
    (0 until nbits).map { b =>
      when(dotConst(vec, plane(b, dim, seed)) > 0d, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side signature of one query vector (same planes as above). */
  def signatureOf(query: Array[Double], nbits: Int, seed: Long): Long =
    (0 until nbits).foldLeft(0L) { (acc, b) =>
      val p = plane(b, query.length, seed)
      val dot = query.zip(p).map { case (x, y) => x * y }.sum
      if (dot > 0d) acc | (1L << b) else acc
    }

  /** All signatures within `maxFlips` bit flips of `sig` (multi-probe). */
  def probeSignatures(sig: Long, nbits: Int, maxFlips: Int): Seq[Long] = {
    require(maxFlips <= 2, "probeHamming > 2 explodes the probe set")
    val one = (0 until nbits).map(b => sig ^ (1L << b))
    val two = if (maxFlips < 2) Seq.empty
      else for { a <- 0 until nbits; b <- (a + 1) until nbits }
        yield sig ^ (1L << a) ^ (1L << b)
    (Seq(sig) ++ (if (maxFlips >= 1) one else Seq.empty) ++ two).distinct
  }

  /** ANN top-k via hyperplane LSH: scan only rows whose signature is within
    * `probeHamming` flips of the query's signature, then exact-rank those.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Array[Double], k: Int, nbits: Int = 16,
              probeHamming: Int = 1, seed: Long = 42L): DataFrame = {
    val sig = lshSignature(col(vecCol), query.length, nbits, seed)
    val probes = probeSignatures(signatureOf(query, nbits, seed), nbits, probeHamming)
    df.withColumn("_sig", sig)
      .filter(col("_sig").isin(probes: _*))
      .select(col(idCol), cosineScore(col(vecCol), query).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold)
    * without a full cross join: candidates must share an LSH bucket (or a
    * 1-flip neighbor bucket via the probe explosion on the left side).
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
                  threshold: Double, nbits: Int = 12,
                  seed: Long = 42L): DataFrame = {
    // dim probe: read one row's vector length (metadata-cheap at any scale)
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    val sig = lshSignature(col(vecCol), dim, nbits, seed)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("_sig"))
    // left side probes its own + 1-flip buckets so near-boundary pairs meet
    val probes = base.select(col("id"), col("v"),
      explode(array(
        (col("_sig") +: (0 until nbits).map(b => col("_sig").bitwiseXOR(lit(1L << b)))): _*
      )).as("_bucket"))
    val l = probes.select(col("_bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("_sig").as("_bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cosine")).as("cosine"))
  }

  // ---------------------------------------------------------------------
  // IVF (inverted-file) index
  // ---------------------------------------------------------------------

  /** Coarse quantizer: k-means centroids. Routes on the OPTIMIZER's size
    * estimate (`optimizedPlan.stats.sizeInBytes` — free, no count scan):
    * small inputs collect once and run Lloyd on the driver; anything
    * larger runs [[fitCentroidsDistributed]], which never materializes
    * the corpus on the driver and scans it at most once per iteration.
    */
  def fitCentroids(df: DataFrame, vecCol: String, k: Int,
                   iters: Int = 10, sampleCap: Int = 10000,
                   seed: Long = 42L): Array[Array[Double]] = {
    val sizeEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeEst <= (64L << 20)) {
      // small-table fast path: one collect (≤64 MB by the estimate), no
      // count pass; the cap bounds the driver fit even if stats low-ball
      val all = df.select(col(vecCol)).collect()
        .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
      require(all.nonEmpty, "empty table")
      val rnd = new scala.util.Random(seed)
      val sample =
        if (all.length <= sampleCap) all
        else rnd.shuffle(all.toVector).take(sampleCap).toArray
      var centroids = kmeansPlusPlusInit(sample, k, new scala.util.Random(seed))
      for (_ <- 0 until iters)
        centroids = lloydStepLocal(sample, centroids)
      centroids
    } else fitCentroidsDistributed(df, vecCol, k, iters, seed = seed)
  }

  /** Distributed k-means fit: ONE `treeAggregate` reservoir pass seeds
    * k-means++ on a bounded driver sample, then each Lloyd iteration is
    * ONE `treeAggregate` over the corpus (broadcast centroids in, k·dim
    * partial sums out — driver and executor state are O(k·dim + R·dim)
    * regardless of table size). Early-stops when the max centroid shift
    * drops below `tol`, so the common case costs far fewer than `iters`
    * scans. This is the 100 TB fit path: no `count()`, no corpus rows on
    * the driver, partials merged tree-wise so the driver never fans in
    * more than √partitions at once.
    */
  def fitCentroidsDistributed(df: DataFrame, vecCol: String, k: Int,
                              iters: Int = 10, reservoirSize: Int = 4096,
                              tol: Double = 1e-4,
                              seed: Long = 42L): Array[Array[Double]] = {
    val vecs = df.select(col(vecCol)).rdd
      .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
    val r = math.max(reservoirSize, 4 * k)
    // pass 1: weighted per-partition reservoirs, merged pairwise by count
    // — an unbiased bounded sample in one scan
    val (sample, _) = vecs.mapPartitionsWithIndex { (pid, it) =>
      val rnd = new scala.util.Random(seed ^ (pid.toLong * 0x9e3779b97f4a7c15L))
      val buf = new scala.collection.mutable.ArrayBuffer[Array[Double]](r)
      var n = 0L
      it.foreach { v =>
        n += 1
        if (buf.length < r) buf += v
        else { val j = rnd.nextLong(n); if (j < r) buf(j.toInt) = v }
      }
      Iterator.single((buf.toArray, n))
    }.treeReduce { case ((r1, n1), (r2, n2)) =>
      if (n1 == 0) (r2, n2)
      else if (n2 == 0) (r1, n1)
      else {
        // draw each merged slot from side 1 with prob n1/(n1+n2)
        val rnd = new scala.util.Random(seed ^ n1 ^ (n2 << 1))
        val (s1, s2) = (rnd.shuffle(r1.toVector), rnd.shuffle(r2.toVector))
        var (i1, i2) = (0, 0)
        val out = Vector.newBuilder[Array[Double]]
        while (i1 + i2 < math.min(r, r1.length + r2.length)) {
          val fromLeft = i2 >= s2.length ||
            (i1 < s1.length && rnd.nextDouble() < n1.toDouble / (n1 + n2))
          if (fromLeft) { out += s1(i1); i1 += 1 } else { out += s2(i2); i2 += 1 }
        }
        (out.result().toArray, n1 + n2)
      }
    }
    require(sample.nonEmpty, "empty table")
    var centroids = kmeansPlusPlusInit(sample, k, new scala.util.Random(seed))
    var it = 0
    var shift = Double.MaxValue
    while (it < iters && shift > tol) {
      val bc = df.sparkSession.sparkContext.broadcast(centroids)
      val dim = centroids.head.length
      val kk = centroids.length
      val (sums, counts) = vecs.treeAggregate(
        (Array.fill(kk)(new Array[Double](dim)), new Array[Long](kk)))(
        seqOp = { case ((s, c), v) =>
          val ci = nearestIdx(bc.value, v)
          val sc = s(ci); var i = 0
          while (i < v.length) { sc(i) += v(i); i += 1 }
          c(ci) += 1
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var ci = 0
          while (ci < kk) {
            val a = s1(ci); val b = s2(ci); var i = 0
            while (i < dim) { a(i) += b(i); i += 1 }
            c1(ci) += c2(ci); ci += 1
          }
          (s1, c1)
        })
      bc.destroy()
      val next = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
      }.toArray
      shift = centroids.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      centroids = next
      it += 1
    }
    centroids
  }

  /** k-means++ seeding (Arthur & Vassilvitskii, SODA'07) over a bounded
    * in-memory sample: spread initial centroids ∝ D² — far better fit
    * than uniform picks at identical cost, for both fit paths.
    */
  private def kmeansPlusPlusInit(sample: Array[Array[Double]], k: Int,
                                 rnd: scala.util.Random): Array[Array[Double]] = {
    val first = sample(rnd.nextInt(sample.length))
    val picked = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
    val d2 = sample.map(v => sqDist(v, first))
    while (picked.length < math.min(k, sample.length)) {
      val total = d2.sum
      val next =
        if (total <= 0) sample(rnd.nextInt(sample.length))
        else {
          var target = rnd.nextDouble() * total
          var i = 0
          while (i < d2.length - 1 && target > d2(i)) { target -= d2(i); i += 1 }
          sample(i)
        }
      picked += next
      var i = 0
      while (i < sample.length) {
        val d = sqDist(sample(i), next)
        if (d < d2(i)) d2(i) = d
        i += 1
      }
    }
    picked.toArray
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  private def lloydStepLocal(sample: Array[Array[Double]],
                             centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val sums = Array.fill(centroids.length)(new Array[Double](sample.head.length))
    val counts = new Array[Long](centroids.length)
    sample.foreach { v =>
      val c = nearestIdx(centroids, v)
      val s = sums(c); var i = 0
      while (i < v.length) { s(i) += v(i); i += 1 }
      counts(c) += 1
    }
    centroids.indices.map { c =>
      if (counts(c) == 0) centroids(c)
      else sums(c).map(_ / counts(c))
    }.toArray
  }

  private def nearestIdx(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cc = cents(c)
      while (i < v.length) { val t = v(i) - cc(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` list ids nearest to `query` (L2 over the centroids —
    * driver-side metadata math shared by every IVF probe site).
    */
  def nearestLists(centroids: Array[Array[Double]], query: Array[Double],
                   nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (cv, i) =>
      (cv.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(_._1).take(nprobe).map(_._2).toSeq

  /** Nearest-centroid list id for every row (broadcast centroids; one
    * codegen'd map pass — at scale, write the table partitioned by this).
    */
  def ivfAssign(df: DataFrame, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    // argmin over ||v-c||² = ||v||² - 2·v·c + ||c||²; ||v||² is common, so
    // rank by (||c||² - 2·v·c) — one fused dot per centroid, no UDF.
    val scored = centroids.zipWithIndex.map { case (cv, i) =>
      val c2 = cv.map(x => x * x).sum
      struct((lit(c2) - dotConst(col(vecCol), cv.map(_ * 2))).as("d"),
        lit(i).as("i"))
    }
    df.withColumn("_list", array_min(array(scored: _*)).getField("i"))
  }

  /** IVF ANN top-k: scan only the `nprobe` inverted lists nearest to the
    * query, exact-rank within them.
    */
  def ivfTopK(assigned: DataFrame, vecCol: String, idCol: String,
              centroids: Array[Array[Double]], query: Array[Double],
              k: Int, nprobe: Int = 3): DataFrame = {
    val byDist = nearestLists(centroids, query, nprobe)
    assigned.filter(col("_list").isin(byDist: _*))
      .select(col(idCol), cosineScore(col(vecCol), query).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Build a PERSISTED IVF index under `indexRoot`: a k-row `centroids`
    * table plus `corpus` — the input with its `_list` assignment,
    * compacted CLUSTERED BY `_list` so each inverted list occupies its
    * own contiguous part range and the committed zone maps carry tight
    * `_list` (min,max) per part. This is the amortized 100 TB shape: the
    * one-time build pays the k-means fit + one clustered rewrite, and
    * every subsequent [[ivfIndexTopK]] opens ONLY the probed lists' files
    * — untouched lists are never read (true inverted-file behavior,
    * where the in-memory [[ivfTopK]] scans everything and filters).
    * Returns the fitted centroids.
    */
  def ivfIndexBuild(spark: SparkSession, df: DataFrame, vecCol: String,
                    idCol: String, indexRoot: String, k: Int,
                    iters: Int = 10, nParts: Int = 32): Array[Array[Double]] = {
    import spark.implicits._
    val cents = fitCentroids(df, vecCol, k, iters)
    graft.storage.VersionedTable(spark, s"$indexRoot/centroids")
      .overwrite(cents.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toSeq) }
        .toDF("list_id", "centroid"): DataFrame)
    val corpus = graft.storage.VersionedTable(spark, s"$indexRoot/corpus")
    corpus.overwrite(ivfAssign(df, vecCol, cents))
    corpus.compactClustered(Seq("_list"), math.min(nParts, k))
    cents
  }

  /** Append new vectors to a persisted IVF index WITHOUT refitting —
    * Faiss `add` semantics: the coarse quantizer is FROZEN at build time,
    * so the delta is assigned to the existing lists and landed via
    * [[graft.storage.VersionedTable.appendClustered]] as `deltaParts`
    * range-clustered parts, each with tight `_list` zone maps. Existing
    * parts are never rewritten (append cost = delta cost) and a probed
    * query prunes inside the delta immediately. Fragmentation accrues
    * `deltaParts` part dirs per append; when the table crosses
    * `compactAboveParts` the call folds everything with one clustered
    * rewrite (the amortized OPTIMIZE — unchanged recall either way,
    * since pruning is zone-map-exact on `_list`).
    *
    * Centroids drift as the corpus grows — standard IVF practice (and
    * this operator's contract) is to refit only on major growth
    * ([[ivfIndexBuild]] again); recall degrades gracefully, correctness
    * of exhaustive probing never does (q88 pins this: frozen-quantizer
    * append + exhaustive probe ≡ brute force over the union).
    * Returns (new version, whether a compaction ran).
    */
  def ivfIndexAppend(spark: SparkSession, delta: DataFrame, vecCol: String,
                     idCol: String, indexRoot: String, deltaParts: Int = 4,
                     compactAboveParts: Int = 64): (Long, Boolean) = {
    val cents = ivfIndexCentroids(spark, indexRoot)
    val corpus = graft.storage.VersionedTable(spark, s"$indexRoot/corpus")
    val v = corpus.appendClustered(ivfAssign(delta, vecCol, cents),
      Seq("_list"), deltaParts)
    val nParts = corpus.state.map(_.parts.size).getOrElse(0)
    if (nParts > compactAboveParts) {
      val v2 = corpus.compactClustered(Seq("_list"),
        math.min(compactAboveParts / 2, math.max(1, cents.length)))
      (v2, true)
    } else (v, false)
  }

  /** The index's centroids, list-id order (k rows — bounded metadata). */
  def ivfIndexCentroids(spark: SparkSession, indexRoot: String): Array[Array[Double]] =
    graft.storage.VersionedTable(spark, s"$indexRoot/centroids").read
      .orderBy(col("list_id")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** ANN top-k against a persisted index: rank the `nprobe` nearest
    * inverted lists on the driver (k centroids — metadata-scale), then a
    * zone-map-pruned read opens only those lists' parts and exact-ranks
    * within them.
    */
  def ivfIndexTopK(spark: SparkSession, indexRoot: String, vecCol: String,
                   idCol: String, query: Array[Double], k: Int,
                   nprobe: Int = 3): DataFrame = {
    val cents = ivfIndexCentroids(spark, indexRoot)
    val lists = nearestLists(cents, query, nprobe)
    graft.storage.VersionedTable(spark, s"$indexRoot/corpus")
      .readWhere(col("_list").isin(lists: _*))
      .select(col(idCol), cosineScore(col(vecCol), query).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // Storage quantization
  // ---------------------------------------------------------------------

  // ---------------------------------------------------------------------
  // Product quantization (PQ)
  // ---------------------------------------------------------------------

  /** PQ codebooks (Jégou, Douze, Schmid, "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): the vector space is split
    * into `m` subspaces and each gets its own k-codeword k-means
    * codebook. A vector then stores only its m nearest-codeword ids —
    * m·log₂k bits instead of dim·32 — and query scoring becomes m table
    * lookups ([[pqTopK]]). Fit reuses [[fitCentroids]] per subspace on
    * the SLICED vectors, so it inherits the stats-routed small-collect /
    * distributed-treeAggregate split; codebooks are statistics, so the
    * bounded sample pins them regardless of corpus size.
    * Returns m × k × (dim/m).
    */
  def pqFit(df: DataFrame, vecCol: String, m: Int, k: Int = 16,
            iters: Int = 10, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val dimRows = df.select(size(col(vecCol))).limit(1).collect()
    require(dimRows.nonEmpty, "pqFit: empty table")
    val dim = dimRows.head.getInt(0)
    require(dim % m == 0, s"pqFit: dim $dim not divisible by m $m")
    val dsub = dim / m
    (0 until m).toArray.map { s =>
      fitCentroids(df.select(slice(col(vecCol), s * dsub + 1, dsub).as("_sub")),
        "_sub", k, iters, seed = seed + s)
    }
  }

  /** LOSSLESS codebooks: every distinct subvector of `df` becomes a
    * codeword, so encode→decode is the identity and ADC scores are the
    * exact dot products — the oracle/test configuration (the q30
    * exhaustive-probe idea applied to PQ). Bounded loudly: a corpus
    * whose subspaces exceed `maxCodewords` distinct values must use the
    * lossy [[pqFit]].
    */
  def pqFitExact(df: DataFrame, vecCol: String, m: Int,
                 maxCodewords: Int = 65536): Array[Array[Array[Double]]] = {
    val dimRows = df.select(size(col(vecCol))).limit(1).collect()
    require(dimRows.nonEmpty, "pqFitExact: empty table")
    val dim = dimRows.head.getInt(0)
    require(dim % m == 0, s"pqFitExact: dim $dim not divisible by m $m")
    val dsub = dim / m
    (0 until m).toArray.map { s =>
      val book = df
        .select(slice(col(vecCol), s * dsub + 1, dsub).as("_sub"))
        .distinct().collect()
        .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
      require(book.length <= maxCodewords,
        s"pqFitExact: subspace $s has ${book.length} distinct subvectors " +
          s"(> $maxCodewords) — use the lossy pqFit for this corpus")
      book
    }
  }

  /** Encode vectors to PQ codes: adds `codeCol: array<int>` (one fused
    * codegen'd scan — [[graft.plans.expressions.PqEncodeExpr]]). With
    * k ≤ 256 each code fits a byte: the stored form is m small ints vs
    * dim floats, the 100 TB embedding-table compression path (8× at
    * dim 64 / m 8 even uncompacted, 32× byte-packed).
    */
  def pqEncode(df: DataFrame, vecCol: String,
               codebooks: Array[Array[Array[Double]]],
               codeCol: String = "_pq"): DataFrame =
    df.withColumn(codeCol, pqEncodeCol(col(vecCol), codebooks))

  /** The query's ADC lookup table: `lut(s)(c) = query_s · codebook(s)(c)`
    * — summing a row's m entries gives dot(query, decode(codes)) exactly.
    */
  def pqLut(codebooks: Array[Array[Array[Double]]],
            query: Array[Double]): Array[Array[Double]] = {
    var off = 0
    codebooks.map { book =>
      val dsub = book(0).length
      val tab = book.map { cw =>
        var d = 0.0; var i = 0
        while (i < dsub) { d += cw(i) * query(off + i); i += 1 }
        d
      }
      off += dsub
      tab
    }
  }

  /** PQ ANN top-k by asymmetric distance: the corpus side reads ONLY the
    * m-int code column (never the vectors, never shuffles), each row
    * costs m table lookups, and TakeOrdered keeps per-partition top-k —
    * the classic ADC scan. Scores are inner products; with
    * [[pqFitExact]] codebooks they equal the exact dot products.
    */
  def pqTopK(encoded: DataFrame, idCol: String,
             codebooks: Array[Array[Array[Double]]], query: Array[Double],
             k: Int, codeCol: String = "_pq"): DataFrame =
    encoded
      .select(col(idCol), pqAdcCol(col(codeCol), pqLut(codebooks, query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Two-stage PQ search: ADC proposes `k × oversample` candidates from
    * the codes alone, then ONLY those rows' real vectors are re-scored
    * exactly (cosine) — the standard recall repair for lossy codebooks
    * at the cost of touching oversample·k full vectors instead of the
    * whole corpus.
    */
  def pqTopKRescore(encoded: DataFrame, vecCol: String, idCol: String,
                    codebooks: Array[Array[Array[Double]]],
                    query: Array[Double], k: Int, oversample: Int = 4,
                    codeCol: String = "_pq"): DataFrame = {
    val cand = encoded
      .select(col(idCol), col(vecCol),
        pqAdcCol(col(codeCol), pqLut(codebooks, query)).as("_adc"))
      .orderBy(desc("_adc"), col(idCol))
      .limit(k * oversample)
    cand.select(col(idCol), cosineScore(col(vecCol), query).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // IVF-PQ (coarse lists + residual product codes — Faiss IVFPQ shape)
  // ---------------------------------------------------------------------

  /** Build a persisted IVF-PQ index (Jégou et al. 2011 §IV, the Faiss
    * `IVFPQ` layout): coarse k-means lists as in [[ivfIndexBuild]], but
    * the stored corpus keeps ONLY `(id, _list, _pq)` where `_pq` encodes
    * the RESIDUAL (vector − list centroid). The residual's norm is much
    * smaller than the vector's, so the same code budget quantizes it far
    * more finely — and the corpus table stores m small ints per row
    * instead of dim floats (the 100 TB shape: a billion-vector index
    * whose data body is codes, vectors nowhere). Scoring needs no
    * decode: `dot(q, v) ≈ dot(q, c_list) + ADC(residual code)` — one
    * per-list constant plus the LIST-INDEPENDENT residual LUT (codebooks
    * are shared across lists, so a probe of 50 lists still builds ONE
    * m×k table).
    *
    * With `exactCodebooks` every distinct residual subvector becomes a
    * codeword — encode→decode is the identity and scores are the exact
    * dot products (the oracle/test configuration, [[pqFitExact]]'s
    * bound applies). Fit, assign, encode, and the clustered rewrite are
    * the same bounded-driver paths as [[ivfIndexBuild]]/[[pqFit]].
    * Returns (centroids, codebooks).
    */
  def ivfPqIndexBuild(spark: SparkSession, df: DataFrame, vecCol: String,
                      idCol: String, indexRoot: String, kLists: Int, m: Int,
                      kCodes: Int = 16, iters: Int = 10,
                      exactCodebooks: Boolean = false, nParts: Int = 32)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    val cents = fitCentroids(df, vecCol, kLists, iters)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val assigned = ivfAssign(df, vecCol, cents)
      .withColumn("_res", zip_with(col(vecCol).cast("array<double>"),
        element_at(centsLit, col("_list") + 1), (a, b) => a - b))
    val books =
      if (exactCodebooks) pqFitExact(assigned.select(col("_res")), "_res", m)
      else pqFit(assigned.select(col("_res")), "_res", m, kCodes, iters)
    graft.storage.VersionedTable(spark, s"$indexRoot/centroids")
      .overwrite(cents.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toSeq) }
        .toDF("list_id", "centroid"): DataFrame)
    graft.storage.VersionedTable(spark, s"$indexRoot/codebooks")
      .overwrite(books.zipWithIndex.toSeq.flatMap { case (book, sub) =>
        book.zipWithIndex.map { case (cw, c) => (sub, c, cw.toSeq) }
      }.toDF("subspace", "code", "codeword"): DataFrame)
    val corpus = graft.storage.VersionedTable(spark, s"$indexRoot/corpus")
    corpus.overwrite(assigned
      .withColumn("_pq", pqEncodeCol(col("_res"), books))
      .select(col(idCol), col("_list"), col("_pq")))
    corpus.compactClustered(Seq("_list"), math.min(nParts, kLists))
    (cents, books)
  }

  /** The index's residual codebooks (m × k × dim/m — bounded metadata). */
  def ivfPqCodebooks(spark: SparkSession, indexRoot: String): Array[Array[Array[Double]]] =
    graft.storage.VersionedTable(spark, s"$indexRoot/codebooks").read
      .orderBy(col("subspace"), col("code")).collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }

  /** ANN top-k against a persisted IVF-PQ index: rank the `nprobe`
    * nearest lists on the driver (metadata-scale), zone-map-pruned read
    * opens only those lists' parts, and each row scores as
    * `dot(q, centroid[_list]) + ADC(code)` — an `element_at` on a
    * broadcast constant array plus m LUT reads, all inside one codegen'd
    * scan of the code column. The full vectors are never stored, never
    * read; recall is the codebooks' (exact codebooks ⇒ exact ranking).
    */
  def ivfPqTopK(spark: SparkSession, indexRoot: String, idCol: String,
                query: Array[Double], k: Int, nprobe: Int = 3): DataFrame =
    ivfPqTopK(spark, indexRoot, idCol, query, k, nprobe,
      ivfIndexCentroids(spark, indexRoot), ivfPqCodebooks(spark, indexRoot))

  /** [[ivfPqTopK]] with the index metadata already loaded — the repeated-
    * query shape (centroids/codebooks are read once per session, not per
    * query; only the pruned corpus scan is per-query).
    */
  def ivfPqTopK(spark: SparkSession, indexRoot: String, idCol: String,
                query: Array[Double], k: Int, nprobe: Int,
                centroids: Array[Array[Double]],
                codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val lists = nearestLists(centroids, query, nprobe)
    val consts = centroids.map(cv =>
      cv.zip(query).map { case (a, b) => a * b }.sum).toSeq
    graft.storage.VersionedTable(spark, s"$indexRoot/corpus")
      .readWhere(col("_list").isin(lists: _*))
      .select(col(idCol),
        (element_at(typedLit(consts), col("_list") + 1) +
          pqAdcCol(col("_pq"), pqLut(codebooks, query))).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Symmetric per-vector int8 quantization: `q[i] = round(x[i]/scale)`
    * with `scale = max|x|/127` — a 4× storage cut for 100 TB embedding
    * tables with ~0.4% worst-case per-component error. Replaces `vecCol`
    * with `<vecCol>_q8: array<tinyint>` plus `<vecCol>_scale: float`.
    * Stateless single scan, no shuffle; cosine ranking on the dequantized
    * vectors is recall-tested in SimilaritySpec. An all-zero vector gets
    * scale 0 and quantizes to zeros.
    */
  /** Deterministic ±1 sign for the JL projection matrix entry (i, j),
    * both ONE-based: +1 iff the first hex nibble of md5("i_j") is even.
    * Trivially reproducible in ANSI SQL (`substr(md5(i||'_'||j),1,1)`),
    * which is what makes the projection oracle-checkable.
    */
  private def jlSign(i: Int, j: Int, salt: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i${salt}$j".getBytes("UTF-8"))
    if ((((md(0) >> 4) & 0xf) & 1) == 0) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 variant,
    * public result: ±1 entries preserve pairwise distances like Gaussian
    * ones) of `vecCol: array<float>` (≤ 64 dims) down to `outDim`
    * dimensions — the cheap way to shrink embedding tables before ANN /
    * clustering at 100 TB (4× fewer bytes at outDim=16 BEFORE int8
    * quantization). Adds `proj: array<double>` (unnormalized — scale by
    * 1/√outDim when distances, not rankings, matter). Map-only: the sign
    * matrix rides into codegen packed as one 64-bit mask per output dim.
    */
  def randomProjection(df: DataFrame, vecCol: String, inDim: Int,
                       outDim: Int, salt: String = "_"): DataFrame = {
    require(inDim <= 64, s"packed sign masks hold ≤64 input dims, got $inDim")
    val masks = Array.tabulate(outDim) { j0 =>
      (0 until inDim).foldLeft(0L) { (m, i0) =>
        if (jlSign(i0 + 1, j0 + 1, salt) == 1) m | (1L << i0) else m
      }
    }
    df.withColumn("proj",
      graft.plans.expressions.randomProject(col(vecCol), masks))
  }

  /** [[randomProjection]] in exact INTEGER arithmetic: each term is
    * `sign(i,j) · floor(v[i]·10⁹)` summed as a long — order-independent
    * and bit-reproducible in any ANSI engine, the oracle tier (the
    * double kernel is the production tier; a spec pins them within
    * truncation distance, ≤ inDim·10⁻⁹ per output). `proj` comes back as
    * `array<long>` SCALED BY 10⁹.
    *
    * Why floor-scaling, not DECIMAL: a float→DECIMAL(·,9) cast ROUNDS,
    * and engines disagree on tie-breaking (HALF_UP vs HALF_EVEN) — rare
    * per-term ±10⁻⁹ divergences that a 2M-term sf1 corpus sum does
    * surface (measured). `floor(double·10⁹)` has no ties: the double
    * product is IEEE-correctly-rounded (identical everywhere) and
    * truncation is unambiguous.
    */
  def randomProjectionExact(df: DataFrame, vecCol: String, inDim: Int,
                            outDim: Int, salt: String = "_"): DataFrame = {
    require(inDim <= 64, s"sign matrix capped at 64 input dims, got $inDim")
    val signs: Seq[Seq[Int]] =
      Seq.tabulate(inDim)(i0 => Seq.tabulate(outDim)(j0 =>
        jlSign(i0 + 1, j0 + 1, salt)))
    val s = typedLit(signs)
    val term = (i: Column, j: Column) => {
      val t = floor(element_at(col(vecCol), i).cast("double") * lit(1e9))
      when(element_at(element_at(s, i), j) === 1, t).otherwise(-t)
    }
    df.withColumn("proj",
      transform(sequence(lit(1), lit(outDim)), j =>
        aggregate(sequence(lit(1), least(lit(inDim), size(col(vecCol)))),
          lit(0L),
          (acc, i) => acc + term(i, j))))
  }

  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val scale = (aggregate(col(vecCol), lit(0.0f),
      (a, x) => greatest(a, abs(x.cast("float")))) / 127f).cast("float").as("scale")
    df.withColumn("_s", scale)
      .withColumn(s"${vecCol}_q8",
        when(col("_s") === 0f,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(vecCol),
            // quotient in DOUBLE: float division can land a hair under
            // n.5 where the double quotient sits at/above it — the
            // double is both the more accurate rounding and the one an
            // ANSI engine reproduces deterministically
            x => round(x.cast("double") / col("_s").cast("double"))
              .cast("byte"))))
      .withColumn(s"${vecCol}_scale", col("_s"))
      .drop("_s", vecCol)
  }

  /** Inverse of [[quantizeInt8]]: reconstruct `vecCol: array<float>` from
    * the int8 payload and per-vector scale.
    */
  def dequantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(vecCol,
      transform(col(s"${vecCol}_q8"),
        // explicit float: Spark promotes float*float arithmetic to double
        q => (q.cast("float") * col(s"${vecCol}_scale")).cast("float")))
      .drop(s"${vecCol}_q8", s"${vecCol}_scale")

  // ---------------------------------------------------------------------
  // SemDeDup
  // ---------------------------------------------------------------------

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embeddings with the IVF coarse quantizer, compute
    * cosine pairs ONLY within each cluster, connect the ≥-threshold pair
    * graph, and keep the smallest id per component. Returns the surviving
    * rows of `df` unchanged.
    *
    * Scale shape: the quadratic step is confined to each cluster — the
    * self-join is an ordinary hash equi-join on the cluster id, so each
    * cluster's pairs are generated partition-locally after ONE shuffle of
    * (cluster, id, vec) rows. Pick k so the expected cluster size n/k
    * keeps (n/k)² per-partition work bounded (SemDeDup's own knob); the
    * centroid fit is a bounded driver-side sample, broadcast back.
    *
    * With `k = 1` every pair is compared: the output is exactly the
    * global cosine-threshold single-linkage dedup (the oracle
    * configuration, same trick as q30's exhaustive-probe IVF).
    */
  def semDedup(df: DataFrame, vecCol: String, idCol: String, k: Int,
               threshold: Double, iters: Int = 5, sampleCap: Int = 10000,
               seed: Long = 42L): DataFrame = {
    val cents = fitCentroids(df, vecCol, k, iters, sampleCap, seed)
    val base = ivfAssign(df, vecCol, cents)
      .select(col("_list"), col(idCol).cast("long").as("id"),
        col(vecCol).as("v"))
    val l = base.select(col("_list"), col("id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("_list"), col("id").as("id_b"), col("v").as("v_b"))
    val pairs = l.join(r, Seq("_list"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
    val dupIds = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .filter(col("id") =!= col("component"))
      .select(col("id").as("_dup_id"))
    df.join(dupIds, col(idCol).cast("long") === col("_dup_id"), "left_anti")
  }

  /** Mutual nearest neighbors between two embedding sets — the bitext /
    * cross-corpus alignment primitive (Artetxe & Schwenk 2019's margin
    * criterion reduces to this at k=1): keep exactly the pairs
    * `(l, r)` where r is l's cosine top-1 in RIGHT and l is r's top-1
    * in LEFT (ties broken by smallest id, so the output is
    * deterministic). Returns `(l_id, r_id, score)`.
    *
    * Scale shape: two [[topKBatch]]-shaped passes at k=1 — each
    * broadcasts ONE side as the query set and streams the other as the
    * corpus (map-side WindowGroupLimit keeps queries×1 rows per
    * mapper) — then an equi-join on the agreeing pairs. For query sets
    * too large to broadcast, pre-bucket with the IVF index and run
    * per-list; the agreement join is unchanged.
    */
  def mutualNearest(left: DataFrame, right: DataFrame,
                    idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def top1(corpus: DataFrame, queries: DataFrame): DataFrame = {
      val q = queries.select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
      corpus.crossJoin(broadcast(q))
        .select(col("_qid"), col(idCol).as("_cid"),
          cosineSimilarity(col(vecCol), col("_qv")).as("_s"))
        .withColumn("_rk", row_number().over(Window.partitionBy(col("_qid"))
          .orderBy(desc("_s"), col("_cid"))))
        .filter(col("_rk") === 1).drop("_rk")
    }
    val l2r = top1(right, left) // per left id: best right
      .select(col("_qid").as("l_id"), col("_cid").as("r_id"),
        col("_s").as("score"))
    val r2l = top1(left, right) // per right id: best left
      .select(col("_cid").as("l_id"), col("_qid").as("r_id"))
    l2r.join(r2l, Seq("l_id", "r_id"))
      .select(col("l_id"), col("r_id"), col("score"))
  }

  /** Per-group centroid-cosine outlier scores — the embedding-quality
    * screen (a vector far from its collection's centroid is mislabeled,
    * corrupt, or off-distribution). Cosine is scale-invariant, so the
    * centroid DIRECTION is just the component-SUM vector — no division
    * by n anywhere, and the whole score pipeline stays exact-integer:
    * components floor-scale to 1e6 ints (the q103 contract), dot and
    * norms are integer sums (S² in DECIMAL(38,0) — a group's summed
    * component squares overflow long), and the one double expression
    * `dot / sqrt(|d|²·|S|²)` floor-scales to micro-units. Returns one
    * row per vector: `(…group…, id, cos_micro)`.
    *
    * Scale shape: explode to (group, component) once; the centroid is a
    * 64-row-per-group aggregate broadcast back; no pairwise work at all.
    */
  def centroidOutliers(df: DataFrame, groupCols: Seq[String],
                       idCol: String, vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "centroidOutliers requires group columns")
    val keys = groupCols.map(col)
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val comps = df
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(keys ++ Seq(col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("_k", "_vf"))): _*)
      .withColumn("_v", floor(lit(1000000d) * col("_vf").cast("double"))
        .cast("long"))
    // every sum below is widened to DECIMAL(38,0) BEFORE its multiply/
    // accumulate: a plain long sum of _v*_v (or of _S over a large group)
    // would wrap silently under non-ANSI arithmetic once components pass
    // ~1e3 magnitude in wide vectors, diverging from the oracle whose
    // BIGINT sums auto-promote to HUGEINT
    val sums = comps.groupBy(keys :+ col("_k"): _*)
      .agg(sum(col("_v").cast(dec38)).as("_S"))
    val perVec = comps.join(sums, groupCols :+ "_k")
      .groupBy(keys :+ col("_id"): _*)
      .agg(sum(col("_v").cast(dec38) * col("_S")).as("_dot"),
        sum(col("_v").cast(dec38) * col("_v")).as("_d2"),
        sum(col("_S") * col("_S")).as("_s2"))
    perVec
      .withColumn("cos_micro",
        floor(lit(1000000d) * col("_dot").cast("double") /
          sqrt(col("_d2").cast("double") * col("_s2").cast("double")))
          .cast("long"))
      .select(keys ++ Seq(col("_id").as(idCol), col("cos_micro")): _*)
  }
}
