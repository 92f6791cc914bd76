package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.plans.expressions._

/** Behavioral tests for dedup operators + the custom Catalyst expressions
  * backing them (SimHash64, RollingFingerprint, CosineSimilarity).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "THE  Quick Brown   Fox jumps over the lazy dog"), // normalized dup of 1
    (4L, "the quick brown fox jumps over the sleepy dog"), // near-dup of 1
    (5L, "completely different content about spark catalyst optimizer rules"),
    (6L, "an unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per normalized fingerprint") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // 1,2,3 collapse (case/whitespace-insensitive), 4,5,6 survive
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L, 6L))
    assert(out.head.getLong(1) == 3L) // n_copies for the collapsed group
  }

  test("rollingFingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = docs.select(rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) == fps(2))
    assert(fps(0) != fps(3) && fps(0) != fps(4))
  }

  test("minhash LSH finds the near-duplicate pair and only real pairs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-2, 1-3, 2-3 are identical; 4 is near-dup of 1/2/3
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("windowed minhash pairs: |Δw| <= 1 pairs survive, distant windows never candidates") {
    import spark.implicits._
    val windowed = docs.withColumn("w", col("doc_id")) // window = id: only adjacent ids pair
    val got = Dedup.minhashPairsWindowed(windowed, "text", "doc_id", "w",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unwindowed finds (1,2),(1,3),(1,4),(2,3),... — blocking must keep
    // exactly the |Δw| <= 1 subset of those
    val unblocked = Dedup.minhashPairs(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = unblocked.filter { case (a, b) => math.abs(a - b) <= 1 }
    assert(got == expected, s"got $got want $expected")
    assert(got.contains((1L, 2L)) && !got.contains((1L, 3L)))
    // no duplicate pair rows from double-banding
    val n = Dedup.minhashPairsWindowed(windowed, "text", "doc_id", "w",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5).count()
    assert(n == got.size)
  }

  test("scratchDir materialization path: identical output to localCheckpoint, durable on disk") {
    import spark.implicits._
    val windowed = docs.withColumn("w", col("doc_id"))
    val local = Dedup.minhashPairsWindowedExact(windowed, "text", "doc_id", "w",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratch = java.nio.file.Files.createTempDirectory("dedup_scratch").toString
    val viaTable = Dedup.minhashPairsWindowedExact(windowed, "text", "doc_id", "w",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5,
      scratchDir = Some(scratch))
    assert(viaTable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == local)
    // the cluster path left a durable parquet materialization behind
    assert(new java.io.File(scratch).listFiles.exists(_.getName.startsWith("mat_")))
    // dedup variant too: same survivors through both paths
    val keptLocal = Dedup.minhashDedupExact(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptScratch = Dedup.minhashDedupExact(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5,
      scratchDir = Some(scratch))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptScratch == keptLocal)
  }

  test("containmentPairs: snippet-in-doc scores 1.0 one way, low the other; cap undercounts only") {
    import spark.implicits._
    val doc = (1 to 60).map(i => s"w$i").mkString(" ")
    val snippet = (1 to 10).map(i => s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, doc), (2L, snippet), (3L, other)).toDF("id", "text")
    val c = Dedup.containmentPairs(df, "text", "id", shingleSize = 3,
        threshold = 0.05, maxShingleFreq = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // snippet (8 trigrams) fully inside doc (58 trigrams): directional
    assert(math.abs(c((2L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(c((1L, 2L)) - 8.0 / 58) < 1e-12)
    // disjoint doc pairs never appear
    assert(!c.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // stop-shingle cap only removes evidence (undercount), never adds
    val capped = Dedup.containmentPairs(df, "text", "id", shingleSize = 3,
        threshold = 0.0001, maxShingleFreq = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    capped.foreach { case (k, v) => assert(v <= c.getOrElse(k, 0.0) + 1e-12) }
  }

  test("minhash dedup keeps one survivor per near-dup cluster") {
    val kept = Dedup.minhashDedup(docs, "text", "doc_id",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(5L) && kept.contains(6L))
    assert(!kept.contains(2L) && !kept.contains(3L))
  }

  test("connectedComponents: chain components collapse to the min id") {
    import spark.implicits._
    // component {3,5,9} with edges touching 9 only; singleton pair {20,21}
    val pairs = Seq((5L, 9L), (3L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(3L) == 3L && cc(5L) == 3L && cc(9L) == 3L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("connectedComponents: a driver-OOM-scale edge limit is rejected loudly") {
    import spark.implicits._
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, driverEdgeLimit = 20000000L)
    }
    assert(e.getMessage.contains("driverEdgeLimit"))
  }

  test("distributed min-label propagation equals driver union-find") {
    import spark.implicits._
    // deep chain (diameter 12) + a star + singleton pairs — exercises
    // multi-iteration convergence in the distributed loop
    val chain = (0L until 12L).map(i => (i, i + 1))
    val star = (100L to 110L).map(i => (100L, i))
    val pairs = (chain ++ star ++ Seq((500L, 501L))).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = Dedup.connectedComponents(pairs, maxIters = 30,
      driverEdgeLimit = 0L) // force the distributed (star) path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCluster == viaDriver)
    assert(viaCluster(12L) == 0L && viaCluster(110L) == 100L)
    // the reference min-label implementation must agree too
    val viaMinLabel = Dedup.minLabelComponents(pairs, maxIters = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMinLabel == viaDriver)
  }

  test("starComponents: deep chain + star + random graph equal union-find") {
    import spark.implicits._
    // a 40-link chain would need 40 min-label rounds; star contraction
    // must resolve it inside the default iteration budget
    val chain = (0L until 40L).map(i => (i, i + 1))
    val star = (100L to 110L).map(i => (110L, i))
    // deterministic pseudo-random graph over ids 200..263
    val rng = new scala.util.Random(42)
    val rand = (1 to 80).map(_ => (200L + rng.nextInt(64), 200L + rng.nextInt(64)))
    val pairs = (chain ++ star ++ rand ++ Seq((500L, 501L))).toDF("id_a", "id_b")
    val viaStar = Dedup.starComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaDriver)
    assert(viaStar(40L) == 0L && viaStar(101L) == 100L)
  }

  test("hot-bucket subdivision: near-dup clusters LARGER than the cap stay connected") {
    import spark.implicits._
    // 6 true near-dup groups of 30 docs each, all sharing a long common
    // prefix: the prefix's shingles dominate every band's min-signature,
    // so MANY (band, bucket) cells hold most of the 180 docs — far past
    // cap = 8. The old capped generator dropped everything past the cap
    // in every band (exactly the 5M-doc stress failure); subdivision must
    // keep every group's 30 docs in one component and never merge groups.
    val prefix = (1 to 40).map(i => s"p$i").mkString(" ")
    val docs = (for {
      g <- 0 until 6
      r <- 0 until 30
    } yield {
      val body = (1 to 12).map(i => s"g${g}w$i").mkString(" ")
      (g * 1000L + r, s"$prefix $body tail$r")
    }).toDF("doc_id", "text")
    val surv = Dedup.minhashDedupExact(docs, "text", "doc_id",
      maxBucketSize = 8).collect().map(_.getLong(0)).toSeq.sorted
    assert(surv == (0 until 6).map(_ * 1000L), surv.toString)
  }

  test("property: shingleSet kernel is byte-identical to the declarative formulation") {
    import spark.implicits._
    // the r9 fused kernel must reproduce split/transform/slice/concat_ws/
    // array_distinct EXACTLY — element order included — on adversarial
    // whitespace (tabs/newlines Spark trim does NOT strip, leading/
    // trailing runs producing empty tokens, repeats, short docs, unicode)
    def declarative(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = split(lower(trim(text)), "\\s+")
      array_distinct(
        when(size(toks) < k, array(concat_ws(" ", toks)))
          .otherwise(transform(
            sequence(lit(1), size(toks) - (k - 1)),
            i => concat_ws(" ", slice(toks, i, lit(k))))))
    }
    val rnd = new scala.util.Random(7)
    val glyphs = Seq("a", "B", "wort", "ÄÖü", "汉字", "x1", ".", "", "\t", "\n")
    val fixed = Seq("", " ", "\t", "a", "a b", " a\tb  c\nd ", "a a a a",
      "one two three four five", "v tab", "Ü Ä ẞ")
    val random = (1 to 60).map(_ =>
      (1 to rnd.nextInt(12)).map(_ => glyphs(rnd.nextInt(glyphs.size)))
        .mkString(Seq(" ", "  ", "\t", "\n")(rnd.nextInt(4))))
    val df = (fixed ++ random).toDF("text")
    for (k <- Seq(1, 2, 3, 5)) {
      val both = df.select(
        Dedup.shingles(col("text"), k).as("kernel"),
        declarative(col("text"), k).as("sql"))
      val bad = both.filter(not(col("kernel") === col("sql"))).count()
      assert(bad == 0L, s"k=$k: $bad rows differ")
    }
  }

  test("property: subdivision matches the uncapped path on random hot-cluster corpora") {
    import spark.implicits._
    // VERDICT r8 #8: across random corpora whose TRUE near-dup clusters
    // exceed the bucket cap, subdivision ∪ star residue must reconnect
    // every cluster the (effectively) uncapped generator finds — the
    // survivor sets must be IDENTICAL. Seeded generation keeps each round
    // deterministic; 6 rounds vary group count, group size (always past
    // the cap), tail entropy, and unrelated-noise volume.
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val cap = 6 + rnd.nextInt(5)                      // 6..10
      val nGroups = 2 + rnd.nextInt(4)                  // 2..5
      val prefix = (1 to 30 + rnd.nextInt(20))
        .map(i => s"s${seed}p$i").mkString(" ")         // shared across groups
      val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      for (g <- 0 until nGroups) {
        val size = cap + 2 + rnd.nextInt(3 * cap)       // always > cap
        val body = (1 to 10 + rnd.nextInt(8))
          .map(i => s"s${seed}g${g}w$i").mkString(" ")
        for (r <- 0 until size)
          docs += ((g * 10000L + r, s"$prefix $body tail${rnd.nextInt(1000)}_$r"))
      }
      for (n <- 0 until rnd.nextInt(20))                // unrelated noise
        docs += ((900000L + n,
          (1 to 25).map(_ => s"n${seed}_${rnd.nextInt(500)}").mkString(" ")))
      val df = docs.toSeq.toDF("doc_id", "text")
      def survivors(bucketCap: Int): Seq[Long] =
        Dedup.minhashDedupExact(df, "text", "doc_id", maxBucketSize = bucketCap)
          .collect().map(_.getLong(0)).toSeq.sorted
      val uncapped = survivors(1000000)
      val subdivided = survivors(cap)
      assert(subdivided == uncapped,
        s"seed=$seed cap=$cap: subdivided=$subdivided uncapped=$uncapped")
      // sanity: each hot group really collapsed to its min id
      assert((0 until nGroups).forall(g => uncapped.contains(g * 10000L)))
    }
  }

  test("starComponents: non-convergence at maxIters throws, never mislabels") {
    import spark.implicits._
    // a 40-link chain cannot reach fixpoint in 1 contraction round
    val chain = (0L until 40L).map(i => (i, i + 1L))
    val e = intercept[IllegalStateException](
      Dedup.starComponents(chain.toDF("id_a", "id_b"), maxIters = 1).collect())
    assert(e.getMessage.contains("fixpoint"))
  }

  test("starComponents: self-loops and empty input are harmless") {
    import spark.implicits._
    assert(Dedup.starComponents(Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .count() == 0L)
    val cc = Dedup.starComponents(Seq((7L, 7L), (7L, 8L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(7L -> 7L, 8L -> 7L))
  }

  test("hot bucket capped: 1k identical docs yield bounded pairs, one survivor") {
    val big = spark.range(1000).select(
      col("id").as("doc_id"),
      lit("same text repeated verbatim across the whole corpus").as("text"))
    // every doc shares every band bucket; the cap bounds the blowup at
    // cap*(cap-1)/2 distinct pairs instead of ~500k
    val nPairs = Dedup.minhashPairs(big, "text", "doc_id", maxBucketSize = 16).count()
    assert(nPairs <= 16L * 15 / 2)
    val nSim = Dedup.simhashPairs(big, "text", "doc_id", maxBucketSize = 16).count()
    assert(nSim <= 16L * 15 / 2)
    // the exact pre-pass collapses the group before LSH: one survivor, id 0
    val kept = Dedup.minhashDedup(big, "text", "doc_id", maxBucketSize = 16)
      .select("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(0L))
  }

  test("non-integral id columns are rejected loudly (silent cast-to-null trap)") {
    val strDocs = Seq(("doc-1", "some text here"), ("doc-2", "some text here"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashDedup(strDocs, "text", "doc_id")
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashDedupExact(strDocs, "text", "doc_id")
    }
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(Seq(("a", "b")).toDF("id_a", "id_b"))
    }
  }

  test("connectedComponents accepts non-long id columns") {
    val pairs = Seq((1, 2), (2, 3)).toDF("id_a", "id_b") // IntegerType ids
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
  }

  test("simhash: identical text -> identical fp; near-dup -> small hamming") {
    val fp = docs.select(simhash64(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) == fp(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0), fp(3)) < ham(fp(0), fp(4)))
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("md5SimHash60 kernel equals its SQL spec (explode + md5 + bit votes)") {
    val d = docs
    val words = d.select(col("doc_id").as("id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .select(col("id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val fpCol = (0 until 60).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val sqlFp = words.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fpCol.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernelFp = d.select(col("doc_id"), md5SimHash60(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelFp == sqlFp)
  }

  test("ngram jaccard pairs: exact quadratic variant agrees on the dup cluster") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleSize = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("ngram jaccard FP boundary: integral t*|S| pairs survive the prefix route") {
    // J(A,B) = 7/100 = exactly the threshold. double(0.07)*100 evaluates
    // to 7.000000000000001, so a naive ceil demands overlap 8 — shortening
    // A's prefix below the first shared shingle (rare-first ordering puts
    // shared shingles LAST) and failing B on the size-ratio filter. The
    // conservative ceil must keep the pair on the prefix route.
    val a = (1 to 100).map(i => s"w$i").mkString(" ")
    val b = (1 to 7).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id",
      shingleSize = 1, threshold = 0.07, allPairsBytes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"boundary pair lost: $pairs")
  }

  test("ngram jaccard routing: prefix-filter path equals the all-pairs path exactly") {
    def run(gate: Long) = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleSize = 2, threshold = 0.3, allPairsBytes = gate)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val prefix = run(0L)            // force the PPJoin route
    val allPairs = run(Long.MaxValue) // force the bounded product
    assert(prefix.keySet == allPairs.keySet,
      s"pair sets differ: ${prefix.keySet} vs ${allPairs.keySet}")
    prefix.foreach { case (k, j) =>
      assert(math.abs(j - allPairs(k)) < 1e-12, s"jaccard differs at $k")
    }
  }

  test("cosineSimilarity expression: correctness + null/zero semantics") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 2f), Array(2f, 4f, 4f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))
    ).toDF("a", "b")
    val out = df.select(cosineSimilarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) - 1.0) < 1e-12)
    assert(out(3) == 0.0)
    // length mismatch -> NULL
    val m = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b"))).collect()
    assert(m.head.isNullAt(0))
  }

  test("dotConst matches manual dot product") {
    val df = Seq(Array(1f, 2f, 3f)).toDF("v")
    val out = df.select(dotConst(col("v"), Array(2.0, 0.5, 1.0))).head.getDouble(0)
    assert(math.abs(out - (2.0 + 1.0 + 3.0)) < 1e-12)
  }

  test("paragraphDedup: first occurrence wins, order preserved, empty docs dropped") {
    val pd = Seq(
      (1L, "alpha beta\n\ncommon boilerplate\n\ngamma delta"),
      (2L, "common boilerplate\n\nunique two"),   // para 1 is a dup of doc 1
      (3L, "common boilerplate"),                 // fully deduped -> removed
      (4L, "unique two\n\nalpha beta\n\nfresh tail") // both dups of earlier docs
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pd, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L)) // doc 3 removed
    assert(out(0)._2 == "alpha beta\n\ncommon boilerplate\n\ngamma delta")
    assert(out(1)._2 == "unique two" && out(1)._3 == 1L && out(1)._4 == 1L)
    assert(out(2)._2 == "fresh tail" && out(2)._4 == 2L)
  }

  test("minhashJoin: cross-relation near-dups found, unrelated pairs absent") {
    val left = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val right = Seq(
      (1L, "the quick brown fox jumps over the sleepy dog"), // near-dup of 2
      (3L, "an unrelated short text about gardens")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashJoin(left, "text", "doc_id",
      right, "text", "doc_id", shingleSize = 2, numHashes = 64,
      bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)), pairs)
    assert(!pairs.exists { case (l, r2) => l == 4L || r2 == 3L })
  }

  test("paragraphDedup: within-doc repeats keep only the first copy") {
    val pd = Seq((1L, "say it\n\nsay it\n\nagain")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pd, "text", "doc_id").collect()
    assert(out.head.getString(1) == "say it\n\nagain")
    assert(out.head.getLong(2) == 2L && out.head.getLong(3) == 1L)
  }

  test("frequentTokenFilter: corpus-ubiquitous tokens drop, order survives") {
    // "the" and "menu" are in 4/4 docs — above 0.5; every other token is
    // in exactly one doc
    val docs = Seq(
      (1L, "the menu alpha beta"),
      (2L, "gamma THE menu"),
      (3L, "the delta menu  epsilon"),
      (4L, "the menu")
    ).toDF("doc_id", "text")
    val out = Dedup.frequentTokenFilter(docs, "text", "doc_id", maxDocFrac = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 fully boilerplate
    assert(out(0)._2 == "alpha beta" && out(0)._3 == 2L && out(0)._4 == 2L)
    assert(out(1)._2 == "gamma" && out(1)._4 == 2L) // case-folded "THE" drops
    assert(out(2)._2 == "delta epsilon")            // double space collapses
  }

  test("frequentTokenFilter: threshold is strict — exactly-at-frac stays") {
    val docs = Seq(
      (1L, "shared one"), (2L, "shared two"),
      (3L, "three"), (4L, "four")
    ).toDF("doc_id", "text")
    // "shared" df = 2 of 4 = exactly 0.5: NOT above the threshold -> kept
    val out = Dedup.frequentTokenFilter(docs, "text", "doc_id", maxDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out.head.getString(1) == "shared one")
  }

  test("substringDedup: later occurrences of a k-gram are scrubbed, spans merge") {
    val d = Seq(
      (1L, "a b c d e"),           // all grams globally first -> untouched
      (2L, "x y a b c d z"),       // "a b c","b c d" dup -> covers pos 2..5
      (3L, "a b c a b c q"),       // both copies are later occurrences
      (4L, "a b c d")              // fully covered -> document removed
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "a b c d e")
    assert(byId(2L).getString(1) == "x y z")
    assert(byId(2L).getLong(2) == 3L && byId(2L).getLong(3) == 4L)
    // doc 3: pos0 "a b c" is occurrence #2 (doc1 pos0 first), pos3 #3;
    // "b c a"/"c a b"/"b c q" are first but their positions sit under the
    // covered spans {0..5} -> only the trailing token survives
    assert(byId(3L).getString(1) == "q")
    assert(byId(3L).getLong(3) == 6L)
  }

  /** In-memory reference for the span scrubbers: walk docs in id order,
    * positions in order; a k-gram already seen marks its k positions
    * covered (coverage accrues only from NON-first occurrences; first
    * occurrences register even when they sit under covered spans —
    * exactly the row_number > 1 rule). `perDoc` resets the seen set per
    * document (repeatedNgramScrub); global seen = substringDedup.
    */
  private def naiveScrub(docs: Seq[(Long, String)], k: Int,
                         perDoc: Boolean): Map[Long, (String, Long, Long)] = {
    val globalSeen = scala.collection.mutable.HashSet[String]()
    docs.sortBy(_._1).flatMap { case (id, text) =>
      val seen = if (perDoc) scala.collection.mutable.HashSet[String]()
                 else globalSeen
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val covered = scala.collection.mutable.HashSet[Int]()
      for (p <- 0 to toks.length - k) {
        val gram = toks.slice(p, p + k).mkString(" ")
        if (!seen.add(gram)) (p until p + k).foreach(covered += _)
      }
      val kept = toks.indices.filterNot(covered)
      if (kept.isEmpty) None
      else Some(id -> (kept.map(toks).mkString(" "),
        kept.length.toLong, (toks.length - kept.length).toLong))
    }.toMap
  }

  test("span scrubbers equal the in-memory reference on random corpora") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 4) {
      val docs = (1L to 18L).map { id =>
        val len = rnd.nextInt(13)
        id -> Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      for ((op, perDoc, k) <- Seq(
        (Dedup.substringDedup(df, "text", "doc_id", 3), false, 3),
        (Dedup.repeatedNgramScrub(df, "text", "doc_id", 2), true, 2))) {
        val got = op.collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
          .toMap
        val want = naiveScrub(docs, k, perDoc)
        assert(got == want,
          s"trial $trial perDoc=$perDoc k=$k\ninput=$docs\ngot=$got\nwant=$want")
      }
    }
  }

  test("repeatedNgramScrub: within-doc repeats drop, cross-doc repeats survive") {
    val d = Seq(
      (10L, "p q p q p q end"),    // bigram "p q"/"q p" loops
      (11L, "p q r"),              // same bigram in ANOTHER doc: untouched
      (12L, "A a A a")             // case-folds to "a a a a", overlap merge
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedNgramScrub(d, "text", "doc_id", n = 2)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // covered = {2,3,4,5}: pos2/pos4 repeat "p q", pos3 repeats "q p"
    assert(byId(10L).getString(1) == "p q end")
    assert(byId(11L).getString(1) == "p q r")
    assert(byId(11L).getLong(3) == 0L)
    assert(byId(12L).getString(1) == "a")
    assert(byId(12L).getLong(2) == 1L && byId(12L).getLong(3) == 3L)
  }
}
