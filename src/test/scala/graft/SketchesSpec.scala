package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Zipf-ish skew: key i repeated 2000/i times for i in 1..20, plus a
    * long tail of singletons — the shape heavy hitters exist for.
    */
  private def skewed = {
    val heads = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"head_$i"))
    val tail = (1 to 5000).map(i => s"tail_$i")
    spark.createDataset(scala.util.Random.shuffle(heads ++ tail).toSeq)
      .repartition(8).toDF("w")
  }

  test("count-min never undercounts; overcount within eps*N") {
    val df = skewed.cache()
    val n = df.count()
    val cms = Sketches.countMin(df, "w", eps = 0.001)
    val exact = df.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("head_1", "head_7", "head_20", "tail_42").foreach { k =>
      val est = cms.estimateCount(k)
      assert(est >= exact(k), s"$k undercounted: $est < ${exact(k)}")
      assert(est <= exact(k) + math.ceil(0.001 * n).toLong * 3,
        s"$k overcounted: $est vs ${exact(k)}")
    }
    df.unpersist()
  }

  test("heavyHitters recovers the true top-k on skewed data, counts near-exact") {
    val df = skewed
    val top = Sketches.heavyHitters(df, "w", k = 10, capacity = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val trueTop = (1 to 10).map(i => s"head_$i" -> (2000L / i)).toMap
    assert(top.map(_._1).toSet == trueTop.keySet,
      s"got ${top.map(_._1).toSeq}")
    // estimates never undercount and stay close (eps is tiny vs n)
    top.foreach { case (k2, est) =>
      assert(est >= trueTop(k2) && est <= trueTop(k2) + 50, s"$k2 -> $est")
    }
  }

  test("heavyHitters works on integral keys") {
    val df = ((1 to 500).map(_ => 7L) ++ (1 to 100).map(_ => 13L) ++
      (1L to 300L)).toDF("id").repartition(4)
    val top = Sketches.heavyHitters(df, "id", k = 2, capacity = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(7L, 13L))
  }

  test("space-saving candidate state is bounded by capacity per partition") {
    val df = (1 to 10000).map(i => s"k$i").toDF("w").repartition(4)
    val cands = Sketches.spaceSavingCandidates(df, "w", capacity = 100)
    // 4 partitions x <= 100 entries
    assert(cands.count() <= 400)
  }

  test("KMV: exact below k; ~1/sqrt(k) accuracy above; set algebra sane") {
    // two overlapping sets: A = 1..30000, B = 20001..50000
    // (|A|=|B|=30000, |A∪B|=50000, |A∩B|=10000)
    val df = spark.range(1, 30001).selectExpr("'a' AS g", "id AS v")
      .union(spark.range(20001, 50001).selectExpr("'b' AS g", "id AS v"))
    val k = 1024
    val sk = Sketches.kmvByGroup(df, "g", "v", k)
    val (a, b) = (sk("a"), sk("b"))
    assert(!a.isExact && !b.isExact)
    def relErr(est: Double, exact: Double) = math.abs(est - exact) / exact
    assert(relErr(a.estimate, 30000) < 0.15, s"a=${a.estimate}")
    assert(relErr(b.estimate, 30000) < 0.15, s"b=${b.estimate}")
    assert(relErr(a.union(b).estimate, 50000) < 0.15,
      s"union=${a.union(b).estimate}")
    // intersection error scales with the union size
    assert(math.abs(a.intersectEstimate(b) - 10000) < 0.15 * 50000,
      s"intersect=${a.intersectEstimate(b)}")
    // exact tier: fewer than k distinct values -> estimates are counts
    val tiny = spark.range(1, 201).selectExpr("'t' AS g", "id AS v")
    val ts = Sketches.kmvByGroup(tiny, "g", "v", k)("t")
    assert(ts.isExact && ts.estimate == 200.0)
    assert(ts.intersectEstimate(ts) == 200.0 && ts.union(ts).estimate == 200.0)
    // determinism: rebuilt sketch is identical
    val again = Sketches.kmvByGroup(df, "g", "v", k)("a")
    assert(again.mins.toSeq == a.mins.toSeq)
  }
}
