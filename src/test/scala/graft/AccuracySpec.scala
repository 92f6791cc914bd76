package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the approximate tiers vs their exact counterparts —
  * the contract that makes an approximation usable at 100 TB.
  */
class AccuracySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact; approx_p50 inside the p45–p55 rank window") {
    import org.apache.spark.sql.functions._
    val approx = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ad"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Queries.q29CountDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rank-error contract: approx_percentile(accuracy=1000) guarantees rank
    // error <= n/1000 = 0.1% of rows; the p45–p55 exact window is 50× wider
    val win = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.45)).as("lo"),
        percentile(col("l_extendedprice"), lit(0.55)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (aDistinct, aP50)) =>
      val e = exact(flag).toDouble
      assert(math.abs(aDistinct - e) / e < 0.05, s"$flag distinct: $aDistinct vs $e")
      val (lo, hi) = win(flag)
      assert(aP50 >= lo && aP50 <= hi, s"$flag p50 $aP50 outside [$lo, $hi]")
    }
    // the oracle-facing surface: every bound boolean q36 emits must hold
    val q36 = Queries.q36ApproxAggs(spark, dir).collect()
    assert(q36.nonEmpty)
    q36.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4), s"q36 bound flipped: $r")
    }
  }

  test("LSH ANN recall: top-10 overlap with brute force >= 30% at 1 probe") {
    val emb = Tables(spark, dir, "embeddings")
    import org.apache.spark.sql.functions._
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toArray
    val exact = graft.operators.Similarity.topK(emb, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = graft.operators.Similarity.lshTopK(emb, "embedding", "vec_id", q, 10,
      nbits = 8, probeHamming = 1).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(lsh).size / 10.0
    assert(recall >= 0.3, s"recall $recall")
    assert(lsh.contains(7L)) // the query vector itself always survives
  }

  // NB: the synthetic embeddings are structureless (uniform random), the
  // worst case for IVF — expected recall ≈ nprobe/k (4/16 = 0.25) plus the
  // guaranteed self-hit. Real clustered embeddings do much better.
  test("IVF ANN recall: top-10 overlap with brute force >= 30% at nprobe=4") {
    val emb = Tables(spark, dir, "embeddings")
    import org.apache.spark.sql.functions._
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toArray
    val exact = graft.operators.Similarity.topK(emb, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val cents = graft.operators.Similarity.fitCentroids(emb, "embedding", k = 16, iters = 5)
    val assigned = graft.operators.Similarity.ivfAssign(emb, "embedding", cents)
    val ivf = graft.operators.Similarity
      .ivfTopK(assigned, "embedding", "vec_id", cents, q, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ivf).size / 10.0
    assert(recall >= 0.3, s"recall $recall")
    assert(ivf.contains(7L))
  }

  test("IVF with nprobe = nlist equals exact brute-force top-k (q30 contract)") {
    val emb = Tables(spark, dir, "embeddings")
    import org.apache.spark.sql.functions._
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble).toArray
    val exact = graft.operators.Similarity.topK(emb, "embedding", "vec_id", q, 12)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ivf = Queries.q30IvfTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq == exact.toSeq) // same ids, same order, bit-equal scores
  }
}
