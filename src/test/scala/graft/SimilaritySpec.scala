package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** ANN correctness: LSH and IVF tiers must find the brute-force winner. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val query: Array[Double] =
    emb.filter(col("vec_id") === 7).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble).toArray

  test("brute-force topK: the query's own vector ranks first with score ~1") {
    val top = Similarity.topK(emb, "embedding", "vec_id", query, 5).collect()
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("topKBatch equals per-query brute-force topK; no corpus shuffle") {
    val queries = emb.filter(col("vec_id").isin(3L, 7L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = graft.operators.Similarity
      .topKBatch(emb, "embedding", "vec_id", queries, "qid", "qvec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for (q <- Seq(3L, 7L)) {
      val qv = emb.filter(col("vec_id") === q)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toArray
      val single = graft.operators.Similarity.topK(emb, "embedding", "vec_id", qv, 5)
        .collect().map(_.getLong(0)).toSet
      assert(batch(q) == single, s"query $q")
    }
    // plan shape: broadcast queries + map-side WindowGroupLimit, ONE exchange
    val plan = graft.operators.Similarity
      .topKBatch(emb, "embedding", "vec_id", queries, "qid", "qvec", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("LSH topK: probed-bucket scan still finds the exact winner") {
    val top = Similarity.lshTopK(emb, "embedding", "vec_id", query, 5,
      nbits = 8, probeHamming = 1).collect()
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("LSH probe set: 1-flip neighborhood has nbits+1 signatures") {
    val probes = Similarity.probeSignatures(5L, 8, 1)
    assert(probes.length == 9 && probes.contains(5L) && probes.contains(4L))
  }

  test("IVF: assignment covers all rows; nprobe search finds the winner") {
    val cents = Similarity.fitCentroids(emb, "embedding", k = 8, iters = 5)
    assert(cents.length == 8)
    val assigned = Similarity.ivfAssign(emb, "embedding", cents).cache()
    assert(assigned.count() == emb.count())
    val lists = assigned.select("_list").distinct().collect().map(_.getInt(0))
    assert(lists.forall(l => l >= 0 && l < 8))
    val top = Similarity.ivfTopK(assigned, "embedding", "vec_id", cents,
      query, 5, nprobe = 2).collect()
    assert(top.head.getLong(0) == 7L)
    assigned.unpersist()
  }

  test("persisted IVF index: probed-lists-only file reads, exhaustive-probe equals brute force") {
    val root = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val cents = Similarity.ivfIndexBuild(spark, emb, "embedding", "vec_id",
      root, k = 8, iters = 5)
    // centroids survive the round trip in list order
    val loaded = Similarity.ivfIndexCentroids(spark, root)
    assert(loaded.length == 8 &&
      loaded.zip(cents).forall { case (a, b) => a.sameElements(b) })
    // probing ALL lists = exhaustive = brute-force ranking, bit-exact
    val all = Similarity.ivfIndexTopK(spark, root, "embedding", "vec_id",
      query, 5, nprobe = 8).collect()
    val brute = Similarity.topK(emb, "embedding", "vec_id", query, 5).collect()
    assert(all.map(_.getLong(0)).toSeq == brute.map(_.getLong(0)).toSeq)
    // nprobe=2 finds the exact winner while the clustered corpus PRUNES
    // the untouched lists' parts at the FILE level (zone maps on _list)
    val probed = Similarity.ivfIndexTopK(spark, root, "embedding", "vec_id",
      query, 5, nprobe = 2)
    assert(probed.collect().head.getLong(0) == 7L)
    val corpus = graft.storage.VersionedTable(spark, root + "/corpus")
    val probeLists = loaded.zipWithIndex.map { case (cv, i) =>
      (cv.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(_._1).take(2).map(_._2).toSeq
    val (kept, total) = corpus.pruneStats(col("_list").isin(probeLists: _*))
    assert(kept < total, s"expected file-level pruning, kept $kept of $total")
    val prunedFiles = corpus.readWhere(col("_list").isin(probeLists: _*))
      .inputFiles.length
    assert(prunedFiles < corpus.read.inputFiles.length)
  }

  test("cosinePairs: finds high-cosine near-dup pairs without cross join") {
    // construct known near-dups: vec 7 plus tiny perturbations
    val base = query.map(_.toFloat)
    val near = base.clone(); near(0) = near(0) + 0.001f
    val far = base.map(-_)
    val df = Seq((100L, base), (101L, near), (102L, far)).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(df, "embedding", "vec_id", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)))
    assert(!pairs.exists { case (a, b) => a == 102L || b == 102L })
  }

  test("int8 quantization: bounded error, rank preserved, exact round-trip shape") {
    val q = Similarity.quantizeInt8(emb, "embedding")
    assert(q.schema("embedding_q8").dataType.simpleString == "array<tinyint>")
    // per-component reconstruction error <= scale/2 (+ float eps)
    val back = Similarity.dequantizeInt8(q, "embedding")
    val joined = back.select(col("vec_id"), col("embedding").as("deq"))
      .join(emb.select(col("vec_id"), col("embedding").as("orig")), "vec_id")
    val maxRel = joined.select(max(aggregate(
      zip_with(col("deq"), col("orig"), (a, b) => abs(a - b).cast("float")),
      lit(0.0f), (acc, x) => greatest(acc, x).cast("float")))).head.getFloat(0)
    val maxAbs = emb.select(max(aggregate(col("embedding"), lit(0.0f),
      (a, x) => greatest(a, abs(x))))).head.getFloat(0)
    assert(maxRel <= maxAbs / 127f / 2f * 1.01f, s"err $maxRel vs bound")
    // ANN over dequantized vectors keeps >= 8 of the true top-10
    val exact = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSet
    val viaQ8 = Similarity.topK(back, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(viaQ8).size >= 8, viaQ8)
    // zero vector edge: scale 0, zeros out, zeros back
    import spark.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zq = Similarity.dequantizeInt8(Similarity.quantizeInt8(z, "embedding"), "embedding")
    assert(zq.select(col("embedding")).head.getSeq[Float](0) == Seq(0f, 0f, 0f))
  }

  test("semDedup: transitive chains collapse to min id; unrelated vectors survive") {
    import spark.implicits._
    // a~b and b~c are near-dups (cos > 0.95) but a~c is looser — single
    // linkage must still collapse all three onto id 1
    val docs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.98f, 0.2f, 0.0f)),
      (3L, Array(0.92f, 0.39f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal — survives
      (11L, Array(0.0f, 0.0f, 1.0f))    // orthogonal — survives
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(docs, "embedding", "vec_id", k = 1,
      threshold = 0.95).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 10L, 11L))
  }

  test("semDedup: clustered (k>1) equals exhaustive (k=1) on separable data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // two tight clusters far apart + noise: any sane centroid fit keeps
    // each near-dup pair within one cluster
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val a = Array(10f, 0f, 0f); val b = Array(0f, 10f, 0f)
    val rows = (1L to 20L).map(i => (i, jitter(if (i <= 10) a else b)))
    val df = rows.toDF("vec_id", "embedding")
    val exhaustive = Similarity.semDedup(df, "embedding", "vec_id", k = 1,
      threshold = 0.999).collect().map(_.getLong(0)).toSet
    val clustered = Similarity.semDedup(df, "embedding", "vec_id", k = 2,
      threshold = 0.999, iters = 10).collect().map(_.getLong(0)).toSet
    assert(clustered == exhaustive)
    assert(exhaustive == Set(1L, 11L)) // one survivor per tight cluster
  }

  test("distributed fit: recovers well-separated centers; bounded quantization error") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 4 well-separated gaussian blobs across 8 partitions: the reservoir
    // pass + treeAggregate Lloyd iterations must find all 4 centers
    val centers = Array(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val rows = (1L to 2000L).map { i =>
      val c = centers(((i - 1) % 4).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(8)
    val fitted = Similarity.fitCentroidsDistributed(df, "embedding", k = 4,
      iters = 10, reservoirSize = 256, seed = 5L)
    assert(fitted.length == 4)
    // every true center is matched by some fitted centroid within the
    // jitter radius — i.e. no cluster was merged or lost
    centers.foreach { c =>
      val d = fitted.map(f =>
        math.sqrt(f.zip(c.map(_.toDouble)).map { case (a, b) =>
          (a - b) * (a - b) }.sum)).min
      assert(d < 0.5, s"center ${c.mkString(",")} unmatched, nearest $d")
    }
    // and the fit agrees with the small-table collect path's quality:
    // mean squared quantization error within the blob variance
    val bcF = fitted
    val mse = rows.map { case (_, v) =>
      val vd = v.map(_.toDouble)
      bcF.map(f => f.zip(vd).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum / rows.length
    assert(mse < 0.05, s"mse $mse")
  }

  test("PQ lossless codebooks: ADC ranking equals brute-force top-k exactly") {
    val books = Similarity.pqFitExact(emb, "embedding", m = 8)
    assert(books.length == 8 && books.forall(_.head.length == 8))
    val enc = Similarity.pqEncode(emb, "embedding", books)
      .select(col("vec_id"), col("_pq"))
    val got = Similarity.pqTopK(enc, "vec_id", books, query, 10)
      .collect().map(_.getLong(0)).toSeq
    val want = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, s"ADC $got vs brute $want")
  }

  test("PQ codes are in range and ADC equals dot(decoded, query)") {
    val books = Similarity.pqFit(emb, "embedding", m = 4, k = 8, iters = 5)
    val enc = Similarity.pqEncode(emb, "embedding", books)
    val rows = enc.select(col("embedding"), col("_pq")).collect()
    val lut = Similarity.pqLut(books, query)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 8))
      // decode via the codebooks and dot with the query: must equal the
      // LUT-sum to FP exactness (same blocked summation order)
      val adc = codes.zipWithIndex.map { case (c, s) => lut(s)(c) }.sum
      val manual = codes.zipWithIndex.map { case (c, s) =>
        val off = s * 16
        books(s)(c).zipWithIndex.map { case (x, i) => x * query(off + i) }.sum
      }.sum
      assert(math.abs(adc - manual) < 1e-9)
    }
  }

  test("IVF-PQ exact codebooks + exhaustive probe: equals brute force; codes-only corpus") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq_t").toString
    val (cents, books) = Similarity.ivfPqIndexBuild(spark, emb, "embedding",
      "vec_id", root, kLists = 4, m = 8, iters = 5,
      exactCodebooks = true, nParts = 4)
    assert(cents.length == 4 && books.length == 8)
    // the persisted data body is (id, list, code) — no vectors anywhere
    val cols = graft.storage.VersionedTable(spark, s"$root/corpus").read.columns
    assert(cols.sorted.toSeq == Seq("_list", "_pq", "vec_id"))
    val got = Similarity.ivfPqTopK(spark, root, "vec_id", query, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val want = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, s"IVF-PQ $got vs brute $want")
  }

  test("IVF-PQ small nprobe: prunes parts, still finds the query's own vector") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq_p").toString
    Similarity.ivfPqIndexBuild(spark, emb, "embedding", "vec_id", root,
      kLists = 8, m = 8, kCodes = 16, iters = 5, nParts = 8)
    val corpus = graft.storage.VersionedTable(spark, s"$root/corpus")
    val cents = Similarity.ivfIndexCentroids(spark, root)
    val near = cents.zipWithIndex.map { case (cv, i) =>
      (cv.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(_._1).take(2).map(_._2).toSeq
    val (kept, total) = corpus.pruneStats(col("_list").isin(near: _*))
    assert(kept < total, s"no pruning: $kept of $total")
    val got = Similarity.ivfPqTopK(spark, root, "vec_id", query, 5, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(got.head == 7L, s"self-match lost: ${got.toSeq}")
  }

  test("PQ and IVF-PQ exact configs equal brute force on random unit vectors") {
    val rnd = new scala.util.Random(7L)
    val data = (1L to 300L).map { i =>
      val v = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / n))
    }
    val df = data.toDF("vec_id", "embedding")
    val q = data(5)._2.map(_.toDouble)
    val want = Similarity.topK(df, "embedding", "vec_id", q, 8)
      .collect().map(_.getLong(0)).toSeq
    val books = Similarity.pqFitExact(df, "embedding", m = 4)
    val enc = Similarity.pqEncode(df, "embedding", books)
      .select(col("vec_id"), col("_pq"))
    assert(Similarity.pqTopK(enc, "vec_id", books, q, 8)
      .collect().map(_.getLong(0)).toSeq == want)
    val root = java.nio.file.Files.createTempDirectory("ivfpq_rnd").toString
    Similarity.ivfPqIndexBuild(spark, df, "embedding", "vec_id", root,
      kLists = 5, m = 4, iters = 4, exactCodebooks = true, nParts = 4)
    assert(Similarity.ivfPqTopK(spark, root, "vec_id", q, 8, nprobe = 5)
      .collect().map(_.getLong(0)).toSeq == want)
  }

  test("PQ lossy fit: rescored search recovers most of brute-force recall") {
    val got = {
      val books = Similarity.pqFit(emb, "embedding", m = 8, k = 16, iters = 10)
      val enc = Similarity.pqEncode(emb, "embedding", books)
      Similarity.pqTopKRescore(enc, "embedding", "vec_id", books, query,
        k = 10, oversample = 4).collect().map(_.getLong(0)).toSet
    }
    val want = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.5, s"recall@10 $recall")
  }

  test("ivfIndexAppend: frozen-quantizer add + exhaustive probe equals brute force; compaction threshold") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 3)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toArray
    val root = java.nio.file.Files.createTempDirectory("ivf_append").toString
    Similarity.ivfIndexBuild(spark, emb.filter(col("vec_id") < 250),
      "embedding", "vec_id", root, k = 8, iters = 4, nParts = 4)
    val corpus = graft.storage.VersionedTable(spark, s"$root/corpus")
    val partsAfterBuild = corpus.state.get.parts.size
    val (_, compacted) = Similarity.ivfIndexAppend(spark,
      emb.filter(col("vec_id") >= 250), "embedding", "vec_id", root,
      deltaParts = 3)
    assert(!compacted)
    // old parts untouched; delta landed as its own clustered ranges
    assert(corpus.state.get.parts.size == partsAfterBuild + 3)
    // exhaustive probe == brute force over the union: nothing lost,
    // nothing double-indexed
    val got = Similarity.ivfIndexTopK(spark, root, "embedding", "vec_id",
      query, 10, nprobe = 8).collect().map(_.getLong(0)).toSeq
    val want = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // a tiny threshold forces the amortized OPTIMIZE on the next append
    val clone = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    val (_, compacted2) = Similarity.ivfIndexAppend(spark, clone,
      "embedding", "vec_id", root, deltaParts = 2, compactAboveParts = 4)
    assert(compacted2)
    // the compacted index still equals brute force over the grown corpus
    val got2 = Similarity.ivfIndexTopK(spark, root, "embedding", "vec_id",
      query, 10, nprobe = 8).collect().map(_.getLong(0)).toSeq
    val want2 = Similarity.topK(emb.unionByName(clone), "embedding",
      "vec_id", query, 10).collect().map(_.getLong(0)).toSeq
    assert(got2 == want2)
  }

  test("randomProjection: kernel equals decimal-exact tier; JL preserves distances") {
    val both = Similarity.randomProjection(
      Similarity.randomProjectionExact(emb, "embedding", 64, 16)
        .withColumnRenamed("proj", "proj_x"),
      "embedding", 64, 16)
    val rows = both.select("proj", "proj_x").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fast = r.getSeq[Double](0)
      val exact = r.getSeq[Long](1).map(_ / 1e9) // proj_x is 1e9-scaled
      assert(fast.size == 16 && exact.size == 16)
      fast.zip(exact).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    }
    // JL property (statistical, generous bounds): scaled projected
    // distances approximate original distances on a sample of pairs
    val vecs = emb.limit(40).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val projected = both.limit(40).select("proj").collect()
      .map(_.getSeq[Double](0).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- 0 until 20; j = i + 20) yield {
      val orig = d2(vecs(i), vecs(j))
      val proj = d2(projected(i), projected(j)) / 16.0 // 1/outDim scaling
      proj / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"JL distance ratio mean $mean")
  }

  test("mutualNearest: only reciprocal top-1 pairs survive") {
    import spark.implicits._
    // l1 aligns with r1, l2 with r2; l3 points at r1 but r1 prefers l1
    val left = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val right = Seq((10L, Array(1f, 0.05f)), (20L, Array(0.05f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .mutualNearest(left, right, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 10L, 2L -> 20L))
  }

  test("mutualNearest: score ties break to the smallest id on both sides") {
    import spark.implicits._
    // two identical right vectors: l's top-1 is the smaller right id;
    // both rights pick the same left, but only (1, 10) is reciprocal
    val left = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val right = Seq((10L, Array(1f, 0f)), (11L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .mutualNearest(left, right, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10L, 1.0)))
  }

  test("centroidOutliers: the off-direction vector scores lowest; aligned score ~1") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 1L, Array(1.0f, 0.0f)),   // aligned with the group mass
      (0L, 2L, Array(0.9f, 0.1f)),
      (0L, 3L, Array(-1.0f, 0.0f)),  // anti-aligned outlier
      (1L, 4L, Array(0.5f, 0.5f)))
    val out = graft.operators.Similarity.centroidOutliers(
        vecs.toDF("grp", "id", "vec"), Seq("grp"), "id", "vec")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cos_micro"))
      .toMap
    assert(out(3L) < 0L)                 // points against the centroid
    assert(out(1L) > 900000L && out(2L) > 900000L)
    assert(out(4L) == 999999L || out(4L) == 1000000L) // lone vector ~ exact 1
    // determinism: identical inputs give identical micro scores
    val again = graft.operators.Similarity.centroidOutliers(
        vecs.toDF("grp", "id", "vec"), Seq("grp"), "id", "vec")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cos_micro"))
      .toMap
    assert(again == out)
  }
}
