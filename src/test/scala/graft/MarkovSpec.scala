package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Markov, Stats}

class MarkovSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- transitions -----------------------------------------------------------

  test("transitions: counts, out-totals and exact ppm on a hand sequence") {
    // key k: A,B,A,B -> A->B x2 (out 2), B->A x1 (out 1)
    val df = Seq(("k", 1, "A"), ("k", 2, "B"), ("k", 3, "A"), ("k", 4, "B"))
      .toDF("u", "i", "s")
    val out = Markov.transitions(df, Seq("u"), Seq("i"), "s").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("out_total"),
          r.getAs[Long]("p_ppm")))).toMap
    assert(out == Map(
      ("A", "B") -> ((2L, 2L, 1000000L)),
      ("B", "A") -> ((1L, 1L, 1000000L))))
  }

  test("transitions: keys are independent; a 1-event key emits nothing") {
    val df = Seq(("a", 1, "X"), ("a", 2, "Y"), ("b", 1, "Y"), ("c", 9, "Z"))
      .toDF("u", "i", "s")
    val out = Markov.transitions(df, Seq("u"), Seq("i"), "s").collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getString(1)) == (("X", "Y")))
  }

  test("transitions: split probabilities are integer-div ppm") {
    // A -> B twice, A -> C once: 666666 / 333333 ppm
    val df = Seq(("k", 1, "A"), ("k", 2, "B"), ("k", 3, "A"), ("k", 4, "C"),
      ("k2", 1, "A"), ("k2", 2, "B")).toDF("u", "i", "s")
    val out = Markov.transitions(df, Seq("u"), Seq("i"), "s").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_ppm"))
      .toMap
    assert(out(("A", "B")) == 666666L && out(("A", "C")) == 333333L)
  }

  // ---- scaledStationary ------------------------------------------------------

  test("scaledStationary: a 2-cycle is its own stationary point") {
    val trans = Seq(("A", "B", 3L, 3L), ("B", "A", 2L, 2L))
      .toDF("from_state", "to_state", "n", "out_total")
    val out = Markov.scaledStationary(trans, iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A" -> 1000000000L, "B" -> 1000000000L))
  }

  test("scaledStationary: absorbing state accumulates, hand-computed rounds") {
    // A: 1/2 self, 1/2 -> B; B absorbing (2 self-loops)
    val trans = Seq(("A", "A", 1L, 2L), ("A", "B", 1L, 2L),
      ("B", "B", 2L, 2L)).toDF("from_state", "to_state", "n", "out_total")
    val r1 = Markov.scaledStationary(trans, iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map("A" -> 500000000L, "B" -> 1500000000L))
    val r2 = Markov.scaledStationary(trans, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2 == Map("A" -> 250000000L, "B" -> 1750000000L))
    intercept[IllegalArgumentException] {
      Markov.scaledStationary(trans, iters = 0)
    }
  }

  // ---- mutualInfo / categoricalEntropy ----------------------------------------

  test("mutualInfo: identical columns give MI = H; independence gives ~0") {
    // a == b, two values 2/2: H = ln 2, MI = ln 2 (floored micro-nats)
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val r = Stats.mutualInfo(same, "a", "b").collect().head
    val ln2Floor = // the operator's own floored-term arithmetic, by hand
      (math.floor(1e6 * 2 * math.log(2 * 4 / (2.0 * 2.0))) * 2) / (1e6 * 4)
    assert(math.abs(r.getAs[Double]("mi") - ln2Floor) < 1e-9)
    assert(math.abs(r.getAs[Double]("hx") - math.log(2.0)) < 1e-5)
    // independent uniform grid: every cell o*n = rt*ct -> ln 1 = 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q") } yield (a, b))
      .toDF("a", "b")
    assert(Stats.mutualInfo(ind, "a", "b").collect().head
      .getAs[Double]("mi") == 0.0)
  }

  test("categoricalEntropy: uniform mix maxes entropy, constant is 0") {
    val df = Seq(("u1", "a"), ("u1", "b"), ("u1", "c"), ("u1", "d"),
      ("u2", "a"), ("u2", "a"), ("u3", "a"), ("u3", "a"), ("u3", "b"))
      .toDF("u", "e")
    val out = Stats.categoricalEntropy(df, Seq("u"), "e").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy")))).toMap
    assert(out("u1")._2 == 4L &&
      math.abs(out("u1")._3 - math.log(4.0)) < 1e-5)
    // ulp-level tolerance: Spark's Log is StrictMath.log, which may sit
    // one ulp off java.lang.Math.log on some inputs
    assert((out("u2")._1, out("u2")._2) == ((2L, 1L)))
    assert(math.abs(out("u2")._3 -
      (math.log(2.0) - math.floor(1e6 * 2 * math.log(2.0)) / (1e6 * 2)))
      < 1e-12)
    // u3: n=3, counts 2,1: entropy = ln3 - floor(1e6*2ln2)/(1e6*3)
    assert(math.abs(out("u3")._3 -
      (math.log(3.0) - math.floor(1e6 * 2 * math.log(2.0)) / (1e6 * 3)))
      < 1e-12)
  }

  // ---- auc -------------------------------------------------------------------

  test("auc: perfect separation is 1, reversed is 0, random-ish by hand") {
    val perfect = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L))
      .toDF("lbl", "v")
    assert(Stats.auc(perfect, "lbl", "v").collect().head
      .getAs[Double]("auc") == 1.0)
    val reversed = Seq((true, 1L), (true, 2L), (false, 3L), (false, 4L))
      .toDF("lbl", "v")
    assert(Stats.auc(reversed, "lbl", "v").collect().head
      .getAs[Double]("auc") == 0.0)
    // pos {2,4}, neg {1,3}: pairs pos>neg = 3 of 4 -> AUC .75
    val mixed = Seq((false, 1L), (true, 2L), (false, 3L), (true, 4L))
      .toDF("lbl", "v")
    val r = Stats.auc(mixed, "lbl", "v").collect().head
    assert((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Double]("auc")) == ((2L, 2L, 0.75)))
  }

  test("auc: score ties contribute half; one-class input yields null") {
    // pos {5}, neg {5}: tie -> AUC 0.5
    val tie = Seq((true, 5L), (false, 5L)).toDF("lbl", "v")
    assert(Stats.auc(tie, "lbl", "v").collect().head
      .getAs[Double]("auc") == 0.5)
    val one = Seq((true, 1L), (true, 2L)).toDF("lbl", "v")
    val r = Stats.auc(one, "lbl", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  // ---- calibration -----------------------------------------------------------

  test("calibration: exact bucket assignment and ppm statistics") {
    // bucket width 100k: scores 50k (b0), 150k (b1) x2, 999999 (b9)
    val df = Seq((50000L, false), (150000L, true), (150000L, false),
      (999999L, true)).toDF("score", "lbl")
    val out = Stats.calibration(df, "score", "lbl", buckets = 10).collect()
      .map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("conf_ppm"),
          r.getAs[Long]("obs_ppm")))).toMap
    assert(out == Map(
      0 -> ((1L, 50000L, 0L)),
      1 -> ((2L, 150000L, 500000L)),
      9 -> ((1L, 999999L, 1000000L))))
    intercept[IllegalArgumentException] {
      Stats.calibration(df, "score", "lbl", buckets = 1)
    }
  }

  // ---- wasserstein1 ----------------------------------------------------------

  test("wasserstein1: point masses at distance d have W1 = d;" +
      " identical samples have W1 = 0") {
    val d = Seq(("a", 0L), ("b", 10L)).toDF("g", "v")
    val r = Stats.wasserstein1(d, "g", "v", "a", "b").collect().head
    assert(r.getAs[Double]("w1") == 10.0)
    val same = Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L)).toDF("g", "v")
    assert(Stats.wasserstein1(same, "g", "v", "a", "b")
      .collect().head.getAs[Double]("w1") == 0.0)
  }

  test("wasserstein1: a constant shift of c moves W1 by exactly c") {
    val base = Seq(1L, 3L, 7L)
    val df = (base.map(("a", _)) ++ base.map(v => ("b", v + 5L)))
      .toDF("g", "v")
    val r = Stats.wasserstein1(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Double]("w1") == 5.0)
  }

  test("wasserstein1: hand-computed unequal sizes") {
    // A = {0, 2} (n=2), B = {2} (n=1): F_a jumps .5 at 0, 1 at 2; F_b 1 at 2
    // integral |F_a - F_b| over [0,2) = 0.5 * 2 = 1.0
    val df = Seq(("a", 0L), ("a", 2L), ("b", 2L)).toDF("g", "v")
    val r = Stats.wasserstein1(df, "g", "v", "a", "b").collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("w1")) == ((2L, 1L, 1.0)))
  }
}
