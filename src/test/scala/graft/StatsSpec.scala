package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Outliers, Stats, Timeseries}

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- linearFit ---------------------------------------------------------

  test("linearFit: a perfect line is recovered exactly") {
    // y = 3x + 7 over x = 1..5 -> slope 3, intercept 7, r2 = 1
    val df = (1L to 5L).map(x => ("g", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = Stats.linearFit(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("linearFit: hand-computed non-perfect fit + degenerate groups") {
    // (0,0),(1,1),(2,1): n=3 sx=3 sy=2 sxy=3 sxx=5 syy=2
    // num = 9-6 = 3, dx = 15-9 = 6, dy = 6-4 = 2
    // slope = 0.5, intercept = (2 - 0.5*3)/3 = 1/6, r2 = 9/12 = 0.75
    val df = Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 1L),
      ("cx", 4L, 1L), ("cx", 4L, 9L), // constant x -> all null
      ("cy", 1L, 5L), ("cy", 2L, 5L)) // constant y -> r2 null, slope 0
      .toDF("g", "x", "y")
    val m = Stats.linearFit(df, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Double]("slope") == 0.5)
    assert(m("a").getAs[Double]("intercept") == 1.0 / 6.0)
    assert(m("a").getAs[Double]("r2") == 0.75)
    assert(m("cx").isNullAt(m("cx").fieldIndex("slope")))
    assert(m("cx").isNullAt(m("cx").fieldIndex("r2")))
    assert(m("cy").getAs[Double]("slope") == 0.0)
    assert(m("cy").isNullAt(m("cy").fieldIndex("r2")))
  }

  test("linearFit: null x or y rows are dropped, not zero-filled") {
    val df = Seq(("g", Some(1L), Some(10L)), ("g", Some(2L), Some(20L)),
      ("g", None, Some(99L)), ("g", Some(9L), None)).toDF("g", "x", "y")
    val r = Stats.linearFit(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("slope") == 10.0)
  }

  // ---- spearman ----------------------------------------------------------

  test("spearman: monotone is +1, reversed is -1, ties average") {
    val mono = (1L to 10L).map(i => ("up", i, i * i)) ++
      (1L to 10L).map(i => ("down", i, -3 * i))
    val r = Stats.spearman(mono.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(r("up") == 1.0)
    assert(r("down") == -1.0)
  }

  test("spearman: tied ranks match the classic averaged-rank formula") {
    // x: 1,2,2,4  -> avg ranks 1, 2.5, 2.5, 4
    // y: 10,20,30,40 -> ranks 1,2,3,4
    // pearson(ranks): sx=10 sy=10 sxy=(1+5+7.5+16)=29.5 sxx=(1+6.25+6.25+16)=29.5 syy=30
    // num = 4*29.5-100 = 18, dx = 4*29.5-100 = 18, dy = 20
    // rho = 18/sqrt(360) = 0.94868...
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 30L), ("g", 4L, 40L))
      .toDF("g", "x", "y")
    val rho = Stats.spearman(df, Seq("g"), "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(math.abs(rho - 18.0 / math.sqrt(360.0)) < 1e-12)
  }

  test("spearman: constant side yields null rho") {
    val df = Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L)).toDF("g", "x", "y")
    val r = Stats.spearman(df, Seq("g"), "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  // ---- autocorr ----------------------------------------------------------

  test("autocorr: alternating series has lag-1 acf -1, lag-2 acf +1") {
    val df = (1L to 12L).map(i => ("g", i, if (i % 2 == 0) 5L else -5L))
      .toDF("g", "x", "v")
    val out = Stats.autocorr(df, Seq("g"), "x", "v", Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(out(1) == -1.0)
    assert(out(2) == 1.0)
    val n = Stats.autocorr(df, Seq("g"), "x", "v", Seq(1)).collect()
      .head.getAs[Long]("n_pairs")
    assert(n == 11L)
  }

  test("autocorr: constant series yields null acf; lag >= n yields no row") {
    val df = Seq(("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L)).toDF("g", "x", "v")
    val r = Stats.autocorr(df, Seq("g"), "x", "v", Seq(1)).collect().head
    assert(r.isNullAt(r.fieldIndex("acf")))
    assert(Stats.autocorr(df, Seq("g"), "x", "v", Seq(5)).count() == 0L)
    intercept[IllegalArgumentException] {
      Stats.autocorr(df, Seq("g"), "x", "v", Seq(0))
    }
  }

  // ---- ksTest --------------------------------------------------------------

  test("ksTest: disjoint samples have D = 1, identical samples D = 0") {
    val disj = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r1 = Stats.ksTest(disj, "g", "v", "a", "b").collect().head
    assert((r1.getAs[Long]("n_a"), r1.getAs[Long]("n_b"),
      r1.getAs[Long]("d_ppm")) == ((2L, 2L, 1000000L)))
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    assert(Stats.ksTest(same, "g", "v", "a", "b")
      .collect().head.getAs[Long]("d_ppm") == 0L)
  }

  test("ksTest: hand-computed partial shift; other groups are ignored") {
    // A = {1,2,3}, B = {2,3,4}: sup|F_a - F_b| = 1/3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L), ("zz", 999L)).toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("d_ppm") == 333333L)
    intercept[IllegalArgumentException] { Stats.ksTest(df, "g", "v", "a", "a") }
  }

  // ---- mannWhitneyU ----------------------------------------------------------

  test("mannWhitneyU: hand-computed no-tie case") {
    // A = {1,2}, B = {3,4}: R_a = 3, U_a = 0; z = -2 / sqrt(5/3)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("u_a2") == 0L)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12)
  }

  test("mannWhitneyU: full tie degenerates sigma to 0 -> z null;" +
      " tied ranks average") {
    val df = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("u_a2") == 1L) // U_a = 0.5 at 2x scale
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ---- rollingZscore -----------------------------------------------------

  test("rollingZscore: planted spike is flagged against its own history") {
    // 30 quiet points alternating 99/101 (mean 100), then a 200 spike
    val rows = (1 to 30).map(i => ("s", i, if (i % 2 == 0) 99L else 101L)) :+
      (("s", 31, 200L))
    val out = Timeseries.rollingZscore(rows.toDF("g", "i", "v"),
      Seq("g"), Seq("i"), "v", window = 50, k = 3.0, minN = 10)
    val flagged = out.filter(col("is_anomaly")).collect()
    assert(flagged.map(_.getAs[Int]("i")).toSeq == Seq(31))
    // z of the spike: history mean 100, sample sd ~1.017 -> z ~ 98
    assert(flagged.head.getAs[Double]("z") > 50.0)
    // warmup rows (< minN history) are unscored
    assert(out.filter(col("z").isNotNull && col("i") <= 10).count() == 0L)
  }

  test("rollingZscore: constant history leaves z null (no div-by-zero)") {
    val rows = (1 to 20).map(i => ("s", i, 7L)) :+ (("s", 21, 8L))
    val out = Timeseries.rollingZscore(rows.toDF("g", "i", "v"),
      Seq("g"), Seq("i"), "v", window = 50, k = 3.0, minN = 5)
    assert(out.filter(col("z").isNotNull).count() == 0L)
  }

  test("rollingZscore: frame excludes the current row") {
    // v = i: trailing mean of 1..k-1 is (k)/2 < k, so every scored z > 0
    val rows = (1 to 15).map(i => ("s", i, i.toLong))
    val out = Timeseries.rollingZscore(rows.toDF("g", "i", "v"),
      Seq("g"), Seq("i"), "v", window = 50, k = 0.5, minN = 3)
    val scored = out.filter(col("z").isNotNull).collect()
    assert(scored.nonEmpty && scored.forall(_.getAs[Double]("z") > 0))
  }

  // ---- trimmedMean ---------------------------------------------------------

  test("trimmedMean: drops floor(p*n) per side; p=0 is the plain mean") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = Outliers.trimmedMean(df, Seq("g"), "v", p = 0.1).collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_trimmed"),
      r.getAs[Double]("trimmed_mean")) == ((10L, 1L, 5.5)))
    val r0 = Outliers.trimmedMean(df, Seq("g"), "v", p = 0.0).collect().head
    assert(r0.getAs[Double]("trimmed_mean") == 5.5 &&
      r0.getAs[Long]("n_trimmed") == 0L)
  }

  test("trimmedMean: tie blocks straddling the cut cannot change the mean") {
    // [1,1,1,9], p=0.25 -> drop one smallest and one largest: keep {1,1}
    val df = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 9L)).toDF("g", "v")
    val r = Outliers.trimmedMean(df, Seq("g"), "v", p = 0.25).collect().head
    assert(r.getAs[Double]("trimmed_mean") == 1.0)
    intercept[IllegalArgumentException] {
      Outliers.trimmedMean(df, Seq("g"), "v", p = 0.5)
    }
  }

  // ---- rollingMedian -----------------------------------------------------

  test("rollingMedian: exact windowed medians, including even-count halves") {
    val rows = Seq(("s", 1, 10L), ("s", 2, 20L), ("s", 3, 90L), ("s", 4, 40L))
    val out = Timeseries.rollingMedian(rows.toDF("g", "i", "v"),
        Seq("g"), Seq("i"), "v", window = 3)
      .collect().map(r => r.getAs[Int]("i") -> r.getAs[Double]("med")).toMap
    assert(out == Map(1 -> 10.0, 2 -> 15.0, 3 -> 20.0, 4 -> 40.0))
  }

  test("rollingMedian: series are independent") {
    val rows = Seq(("a", 1, 1L), ("a", 2, 3L), ("b", 1, 100L), ("b", 2, 200L))
    val out = Timeseries.rollingMedian(rows.toDF("g", "i", "v"),
        Seq("g"), Seq("i"), "v", window = 7)
      .collect().map(r => (r.getString(0), r.getAs[Int]("i")) ->
        r.getAs[Double]("med")).toMap
    assert(out(("a", 2)) == 2.0 && out(("b", 2)) == 150.0)
  }

  // ---- welchT ------------------------------------------------------------

  test("welchT: textbook two-sample case matches the closed form") {
    // a = {1,2,3,4,5} (mean 3, var 2.5), b = {2,4,6,8,10,12} (mean 7, var 14)
    val rows = Seq(1, 2, 3, 4, 5).map(("a", _)) ++
      Seq(2, 4, 6, 8, 10, 12).map(("b", _))
    val r = Stats.welchT(rows.toDF("g", "x"), "g", "x", "a", "b")
      .collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 6)
    val se2 = 2.5 / 5 + 14.0 / 6
    val t = (3.0 - 7.0) / math.sqrt(se2)
    val df = se2 * se2 / (math.pow(2.5 / 5, 2) / 4 + math.pow(14.0 / 6, 2) / 5)
    assert(math.abs(r.getDouble(2) - t) < 1e-12, r.getDouble(2))
    assert(math.abs(r.getDouble(3) - df) < 1e-9, r.getDouble(3))
  }

  test("welchT: singleton or constant-both slices yield null t") {
    val r1 = Stats.welchT(Seq(("a", 1), ("b", 2), ("b", 3)).toDF("g", "x"),
      "g", "x", "a", "b").collect().head
    assert(r1.isNullAt(2) && r1.isNullAt(3))
    val r2 = Stats.welchT(
      Seq(("a", 5), ("a", 5), ("b", 7), ("b", 7)).toDF("g", "x"),
      "g", "x", "a", "b").collect().head
    assert(r2.isNullAt(2)) // se2 = 0: no variance anywhere
  }

  // ---- momentsProfile ----------------------------------------------------

  test("momentsProfile: hand-computed skew/kurtosis on a small group") {
    // x = {2, 2, 5, 7}: mean 4; devs = {-2,-2,1,3};
    // m2 = 4+4+1+9 = 18; m3 = -8-8+1+27 = 12; m4 = 16+16+1+81 = 114
    val df = Seq(2, 2, 5, 7).map(("g", _)).toDF("k", "x")
    val r = Stats.momentsProfile(df, Seq("k"), "x").collect().head
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("mean") == 4.0)
    assert(math.abs(r.getAs[Double]("variance") - 6.0) < 1e-12)
    val skew = math.sqrt(4.0) * 12.0 / (18.0 * math.sqrt(18.0))
    val kurt = 4.0 * 114.0 / (18.0 * 18.0) - 3.0
    assert(math.abs(r.getAs[Double]("skewness") - skew) < 1e-12)
    assert(math.abs(r.getAs[Double]("kurt_excess") - kurt) < 1e-12)
  }

  test("momentsProfile: constant group nulls shape stats; groups independent") {
    val df = (Seq.fill(5)(("c", 9)) ++ Seq(("n", 1), ("n", 2), ("n", 3)))
      .toDF("k", "x")
    val out = Stats.momentsProfile(df, Seq("k"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").isNullAt(4) && out("c").isNullAt(5))
    assert(math.abs(out("n").getAs[Double]("variance") - 1.0) < 1e-12)
    assert(math.abs(out("n").getAs[Double]("skewness")) < 1e-12)
  }

  // ---- crossCorr ---------------------------------------------------------

  test("crossCorr: a 2-step trailing copy peaks at exactly lag -2") {
    // y_t = x_{t-2}: pairs (x_t, y_{t-lag}) align perfectly at lag -2
    def f(t: Int) = ((t * 37) % 11).toLong
    val rows = (2 until 40).map(t => ("g", t, f(t), f(t - 2)))
    val out = Stats.crossCorr(rows.toDF("k", "t", "x", "y"),
        Seq("k"), "t", "x", "y", Seq(-2, -1, 0, 2))
      .collect().map(r => r.getAs[Int]("lag") ->
        Option(r.getAs[Any]("ccf")).map(_.asInstanceOf[Double])).toMap
    assert(math.abs(out(-2).get - 1.0) < 1e-12)
    assert(out(0).get < 0.999)
  }

  test("crossCorr: lag 0 equals pearson; constant side nulls") {
    val rows = (0 until 20).map(t => ("g", t, t.toLong, (3 * t + 1).toLong))
    val df = rows.toDF("k", "t", "x", "y")
    val c0 = Stats.crossCorr(df, Seq("k"), "t", "x", "y", Seq(0))
      .collect().head.getAs[Double]("ccf")
    assert(math.abs(c0 - 1.0) < 1e-12) // perfectly linear
    val const = (0 until 10).map(t => ("g", t, t.toLong, 5L))
    val r = Stats.crossCorr(const.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", Seq(0)).collect().head
    assert(r.isNullAt(r.fieldIndex("ccf")))
  }

  // ---- ridgeFit ----------------------------------------------------------

  test("ridgeFit: lambda=0 recovers an exact planar relationship") {
    // y = 3 + 2*x1 + 5*x2 exactly
    val rows = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 3L))
      .map { case (a, b) => ("g", a, b, 3 + 2 * a + 5 * b) }
    val r = Stats.ridgeFit(rows.toDF("k", "x1", "x2", "y"),
        Seq("k"), "x1", "x2", "y", lambda = 0d).collect().head
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-9)
  }

  test("ridgeFit: collinear features are singular at lambda=0, stable above") {
    val rows = (1L to 6L).map(i => ("g", i, 2 * i, 10 * i))
    val df = rows.toDF("k", "x1", "x2", "y")
    val r0 = Stats.ridgeFit(df, Seq("k"), "x1", "x2", "y", 0d).collect().head
    assert(r0.isNullAt(2) && r0.isNullAt(3) && r0.isNullAt(4))
    val r1 = Stats.ridgeFit(df, Seq("k"), "x1", "x2", "y", 10d).collect().head
    // penalized solve exists and splits the collinear weight ~1:2
    assert(!r1.isNullAt(3) && !r1.isNullAt(4))
    assert(r1.getDouble(4) > r1.getDouble(3))
  }

  test("ridgeFit: growing lambda shrinks coefficients toward zero") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { _ =>
      val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(30).toLong
      ("g", a, b, 7 + 3 * a - 2 * b + rnd.nextInt(5))
    }
    val df = rows.toDF("k", "x1", "x2", "y")
    def norm(l: Double) = {
      val r = Stats.ridgeFit(df, Seq("k"), "x1", "x2", "y", l).collect().head
      math.abs(r.getDouble(3)) + math.abs(r.getDouble(4))
    }
    assert(norm(0d) > norm(1e6) && norm(1e6) > norm(1e9))
  }

  // ---- intervalUnion -----------------------------------------------------

  test("intervalUnion: overlap and touch merge, gaps split, counts exact") {
    // [1,3)+[3,5) touch -> [1,5); [2,4) overlaps; [7,9) is its own island
    val iv = Seq(("u", 1L, 3L), ("u", 3L, 5L), ("u", 2L, 4L), ("u", 7L, 9L))
      .toDF("k", "s", "e")
    val out = Timeseries.intervalUnion(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 5L, 3L), (7L, 9L, 1L)))
  }

  test("intervalUnion: containment and duplicate intervals merge; keys independent") {
    val iv = Seq(("a", 0L, 10L), ("a", 2L, 3L), ("a", 2L, 3L),
      ("b", 2L, 3L)).toDF("k", "s", "e")
    val out = Timeseries.intervalUnion(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(("a", 0L, 10L, 3L), ("b", 2L, 3L, 1L)))
  }

  test("intervalUnion: an island ending early inside a longer one stays merged") {
    // running-max-end matters: [0,100), [1,2), [3,4) — the short end
    // at 2 must not open a new island at 3
    val iv = Seq(("k", 0L, 100L), ("k", 1L, 2L), ("k", 3L, 4L))
      .toDF("k", "s", "e")
    val out = Timeseries.intervalUnion(iv, Seq("k"), "s", "e").collect()
    assert(out.length == 1 && out.head.getLong(3) == 3L)
  }

  // ---- bootstrapMeanCI ---------------------------------------------------

  test("bootstrapMeanCI: id-pure — reorder/repartition reproduces the CI") {
    val df = (0 until 400).map(i => ("g", i.toLong, (i % 50).toLong))
      .toDF("k", "id", "x")
    val a = Stats.bootstrapMeanCI(df, Seq("k"), "id", "x", reps = 50)
      .collect().head
    val b = Stats.bootstrapMeanCI(df.orderBy(rand(3)).repartition(7),
        Seq("k"), "id", "x", reps = 50)
      .collect().head
    assert(a == b)
  }

  test("bootstrapMeanCI: interval brackets the point estimate, lo <= hi") {
    val df = (0 until 1000).map(i => ("g", i.toLong, (i % 100).toLong))
      .toDF("k", "id", "x")
    val r = Stats.bootstrapMeanCI(df, Seq("k"), "id", "x", reps = 100)
      .collect().head
    val (n, mean, nReps, lo, hi) = (r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5))
    assert(n == 1000 && nReps == 100)
    assert(lo <= mean && mean <= hi, s"$lo / $mean / $hi")
    assert(lo < hi)
    // a 95% CI of a 1000-row mean of U{0..99} is a few units wide, not 30
    assert(hi - lo > 0.5 && hi - lo < 30, hi - lo)
  }

  test("bootstrapMeanCI: groups are independent and both get intervals") {
    val df = ((0 until 300).map(i => ("a", i.toLong, 10L)) ++
      (0 until 300).map(i => ("b", i.toLong + 1000, 500L)))
      .toDF("k", "id", "x")
    val out = Stats.bootstrapMeanCI(df, Seq("k"), "id", "x", reps = 40)
      .collect().map(r => r.getString(0) -> r).toMap
    // constant columns: every replicate mean is the constant
    assert(out("a").getDouble(4) == 10.0 && out("a").getDouble(5) == 10.0)
    assert(out("b").getDouble(4) == 500.0 && out("b").getDouble(5) == 500.0)
  }

  test("momentsProfile: cents-scale x^4 does not overflow (decimal product)") {
    // |x| = 56021 -> x^4 ~ 9.8e18 > Long.MaxValue: the decimal product
    // must carry it exactly
    val df = Seq(56021L, -56021L, 56021L, -56021L).map(("g", _)).toDF("k", "x")
    val r = Stats.momentsProfile(df, Seq("k"), "x").collect().head
    assert(r.getAs[Double]("mean") == 0.0)
    assert(r.getAs[Double]("kurt_excess") == 1.0 - 3.0) // two-point symmetric
  }

  private def iso(pts: (Long, Long)*): Map[Long, Double] =
    Stats.isotonicFit(pts.map { case (x, y) => ("g", x, y) }
        .toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getAs[Long]("x") -> r.getAs[Double]("fitted"))
      .toMap

  test("isotonicFit: textbook PAVA pooling") {
    // violation (0,1,0) pools the last two at 1/2
    assert(iso(0L -> 0L, 1L -> 1L, 2L -> 0L) ==
      Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5))
    // already monotone input is returned unchanged
    assert(iso(0L -> 0L, 1L -> 1L, 2L -> 1L) ==
      Map(0L -> 0.0, 1L -> 1.0, 2L -> 1.0))
    // fully decreasing input pools to the global mean
    assert(iso(0L -> 3L, 1L -> 2L, 2L -> 1L).values.toSet == Set(2.0))
  }

  test("isotonicFit: duplicate x values weight the pooled means") {
    // x=0 has rows y={0,0}, x=1 has y=1: means 0 then 1 — monotone
    val m = Stats.isotonicFit(Seq(("g", 0L, 0L), ("g", 0L, 0L), ("g", 1L, 1L))
        .toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getAs[Long]("x") ->
        (r.getAs[Long]("n"), r.getAs[Double]("fitted"))).toMap
    assert(m == Map(0L -> (2L, 0.0), 1L -> (1L, 1.0)))
    // violation with unequal weights: x=0 (two 1s), x=1 (one 0) pools at 2/3
    assert(iso(0L -> 1L, 0L -> 1L, 1L -> 0L).values.toSet
      == Set(2.0 / 3.0))
  }

  test("isotonicFit output is always non-decreasing on random input") {
    val rnd = new scala.util.Random(13)
    val pts = (0 until 40).map(i => i.toLong -> rnd.nextInt(10).toLong)
    val fit = iso(pts: _*).toSeq.sortBy(_._1).map(_._2)
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b }, fit)
    // and it is the least-squares monotone fit: equals driver-side PAVA
    val (xs, ys) = (pts.map(_._1), pts.map(_._2.toDouble))
    val pool = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)] // (sum, w)
    ys.foreach { y =>
      pool += ((y, 1.0))
      while (pool.length > 1 &&
          pool(pool.length - 2)._1 / pool(pool.length - 2)._2 >=
            pool.last._1 / pool.last._2) {
        val a = pool.remove(pool.length - 1); val b = pool.remove(pool.length - 1)
        pool += ((a._1 + b._1, a._2 + b._2))
      }
    }
    val pava = pool.flatMap { case (s, w) =>
      Seq.fill(w.toInt)(s / w) }.toSeq
    assert(fit.zip(pava).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  private def km(subjects: (Long, Long)*): Map[Long, (Long, Long, Double)] =
    Stats.kaplanMeier(subjects.map { case (t, e) => ("g", t, e) }
        .toDF("k", "dur", "e"), Seq("k"), "dur", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("survival")))).toMap

  test("kaplanMeier: textbook curve with censoring") {
    // 4 subjects: death at t=1, censored at t=2, death at t=3, censored t=4
    // S(1) = 3/4; t=2 censor only: S stays 3/4, risk drops to 2 after;
    // S(3) = 3/4 * 1/2 = 3/8; t=4 censor only
    val out = km(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L)
    assert(out(1L) == ((4L, 1L, 0.75)))
    assert(out(2L) == ((3L, 0L, 0.75)))
    assert(out(3L) == ((2L, 1L, 0.375)))
    assert(out(4L) == ((1L, 0L, 0.375)))
  }

  test("kaplanMeier: censoring matters — naive death-rate would differ") {
    // all-censored cohort: survival 1.0 throughout
    assert(km(5L -> 0L, 6L -> 0L).values.forall(_._3 == 1.0))
    // full death at the last time zeroes the curve via the extinct flag
    val out = km(1L -> 1L, 2L -> 1L, 2L -> 1L)
    assert(math.abs(out(1L)._3 - 0.666667) < 1e-9)
    assert(out(2L)._3 == 0.0)
  }

  test("kaplanMeier: ties at one time count together") {
    // 2 of 4 die at t=1 -> S(1) = 0.5; remaining censored at 2
    val out = km(1L -> 1L, 1L -> 1L, 2L -> 0L, 2L -> 0L)
    assert(out(1L) == ((4L, 2L, 0.5)) && out(2L) == ((2L, 0L, 0.5)))
  }

  test("weightedQuantile: cumulative-weight crossing, not row counting") {
    // values 1 (w=1), 2 (w=1), 10 (w=8): unweighted median is 2, but the
    // weight mass says 10 (cum 2/10 < 5 at v=2; crosses at v=10)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 10L, 8L))
      .toDF("k", "v", "w")
    val out = Stats.weightedQuantile(df, Seq("k"), "v", "w", Seq(0.2, 0.5))
      .collect().map(r => r.getAs[Double]("q") ->
        (r.getAs[Long]("value"), r.getAs[Long]("total_weight"))).toMap
    assert(out(0.5) == ((10L, 10L)))
    assert(out(0.2) == ((2L, 10L))) // cum at v=2 is 2 = 0.2*10 exactly
    // zero/negative weights are excluded; duplicate values merge
    val out2 = Stats.weightedQuantile(
        Seq(("g", 5L, 3L), ("g", 5L, 2L), ("g", 7L, 0L), ("g", 9L, -1L))
          .toDF("k", "v", "w"), Seq("k"), "v", "w", Seq(1.0))
      .head()
    assert(out2.getAs[Long]("value") == 5L &&
      out2.getAs[Long]("total_weight") == 5L)
  }

  test("theilSen: median slope shrugs off the outlier OLS follows") {
    // clean slope 2 with ONE wild point: pairwise-median stays 2.0
    val pts = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("g", 3L, 6L), ("g", 4L, 1000L))
    val r = Stats.theilSen(pts.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .head()
    assert(r.getAs[Long]("n_points") == 5 && r.getAs[Long]("n_pairs") == 10)
    assert(r.getAs[Long]("slope_micro") == 2000000L)
    // OLS on the same data is dragged far above 2
    val ols = Stats.linearFit(pts.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .head().getAs[Double]("slope")
    assert(ols > 100)
  }

  test("theilSen: duplicate x's collapse by sum; domain bound fails loud") {
    val r = Stats.theilSen(
        Seq(("g", 0L, 1L), ("g", 0L, 1L), ("g", 1L, 4L)).toDF("k", "x", "y"),
        Seq("k"), "x", "y").head()
    // x=0 pools to y=2, x=1 is 4: one pair, slope 2
    assert(r.getAs[Long]("n_pairs") == 1 &&
      r.getAs[Long]("slope_micro") == 2000000L)
    val big = (0 until 50).map(i => ("g", i.toLong, 1L)).toDF("k", "x", "y")
    val e = intercept[IllegalArgumentException](
      Stats.theilSen(big, Seq("k"), "x", "y", maxPoints = 10))
    assert(e.getMessage.contains("rollup"))
  }

  test("isotonicFit fails loud above the domain bound") {
    val df = (0 until 50).map(i => ("g", i.toLong, 1L)).toDF("k", "x", "y")
    val e = intercept[IllegalArgumentException](
      Stats.isotonicFit(df, Seq("k"), "x", "y", maxDomain = 10))
    assert(e.getMessage.contains("quantize"))
  }

  test("kendallTau: hand case without ties") {
    // x=1..4, y=(1,3,2,4): one discordant pair (2,3) of six
    val df = Seq(("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 2L), ("g", 4L, 4L))
      .toDF("k", "x", "y")
    val r = Stats.kendallTau(df, Seq("k"), "x", "y").head()
    assert(r.getAs[Long]("concordant") == 5 &&
      r.getAs[Long]("discordant") == 1)
    assert(r.getAs[Long]("ties_x") == 0 && r.getAs[Long]("ties_y") == 0)
    // tau = 4/6 -> floor(1e6 * 4 / sqrt(36)) = 666666
    assert(r.getAs[Long]("tau_micro") == 666666L)
  }

  test("kendallTau: tie correction shrinks the denominator") {
    // x=(1,1,2,3), y=(1,2,2,3): nc=4, tie_x=1, tie_y=1 -> tau_b = 4/5
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 2L), ("g", 3L, 3L))
      .toDF("k", "x", "y")
    val r = Stats.kendallTau(df, Seq("k"), "x", "y").head()
    assert(r.getAs[Long]("concordant") == 4 &&
      r.getAs[Long]("ties_x") == 1 && r.getAs[Long]("ties_y") == 1)
    assert(r.getAs[Long]("tau_micro") == 800000L)
  }

  test("kendallTau: constant side yields NULL tau; maxPoints fails loud") {
    val const = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L))
      .toDF("k", "x", "y")
    assert(Stats.kendallTau(const, Seq("k"), "x", "y")
      .head().isNullAt(7))
    val big = (0 until 50).map(i => ("g", i.toLong, 1L)).toDF("k", "x", "y")
    val e = intercept[IllegalArgumentException](
      Stats.kendallTau(big, Seq("k"), "x", "y", maxPoints = 10))
    assert(e.getMessage.contains("rollup"))
  }

  test("fleissKappa: two-unit hand case; inconsistent m fails loud") {
    // unit1 (a,a), unit2 (a,b): Po=1/2, Pe=5/8 -> kappa = -1/3
    val df = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"))
      .toDF("u", "c")
    val r = Stats.fleissKappa(df, "u", "c").head()
    assert(r.getAs[Long]("n_units") == 2 && r.getAs[Long]("m_raters") == 2)
    assert(r.getAs[Long]("po_ppm") == 500000L)
    assert(math.abs(r.getAs[Double]("kappa") - (-1.0 / 3)) < 1e-12)
    val uneven = df.union(Seq(("u3", "a")).toDF("u", "c"))
    val e = intercept[IllegalArgumentException](
      Stats.fleissKappa(uneven, "u", "c").head())
    assert(e.getMessage.contains("constant rating count"))
  }

  test("fleissKappa: perfect agreement is kappa 1; all-one-category is NULL") {
    val perfect = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b"))
      .toDF("u", "c")
    assert(math.abs(
      Stats.fleissKappa(perfect, "u", "c").head().getAs[Double]("kappa")
        - 1.0) < 1e-12)
    val constant = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
      .toDF("u", "c")
    assert(Stats.fleissKappa(constant, "u", "c").head().isNullAt(3))
  }

  test("bhFdr: adjusted q-values are the reverse running min; alpha gates") {
    val df = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.5))
      .toDF("id", "p")
    val out = Stats.bhFdr(df, Seq("id"), "p", alpha = 0.1)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("q_value"),
          r.getAs[Boolean]("significant"))).toMap
    // raw p*n/i = (0.04, 0.04, 0.04, 0.5); reverse min leaves them as-is
    assert(out("t1") == ((1, 0.04, true)))
    assert(out("t2") == ((2, 0.04, true)))
    assert(out("t3") == ((3, 0.04, true)))
    assert(out("t4") == ((4, 0.5, false)))
    // monotone repair: a later SMALLER raw value pulls earlier q down
    val df2 = Seq(("a", 0.04), ("b", 0.05)).toDF("id", "p")
    val q2 = Stats.bhFdr(df2, Seq("id"), "p", 0.1)
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[Double]("q_value")).toMap
    // raw = (0.08, 0.05) -> q(a) = min(0.08, 0.05) = 0.05
    assert(q2("a") == 0.05 && q2("b") == 0.05)
  }
}
