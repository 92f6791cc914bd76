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
}
