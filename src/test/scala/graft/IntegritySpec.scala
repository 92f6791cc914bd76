package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.{Expectations, Relevance, Stats}

class IntegritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- canonicalizeUrl -----------------------------------------------------

  private def canon(urls: String*): Seq[String] = {
    val df = urls.toDF("u")
    df.select(TextFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizeUrl: the five cosmetic variants fold to one key") {
    val out = canon(
      "https://H7.Example.com/p/42/",
      "https://h7.example.com:443/p/42",
      "https://h7.example.com/p/42?utm_source=x&utm_medium=y",
      "https://h7.example.com/p/42#frag",
      "http://h7.example.com:80/p/42")
    assert(out.take(4).toSet == Set("https://h7.example.com/p/42"))
    assert(out(4) == "http://h7.example.com/p/42")
  }

  test("canonicalizeUrl: real params survive, tracking params drop") {
    assert(canon("https://a.com/x?ref=abc&page=2") ==
      Seq("https://a.com/x?page=2"))
    assert(canon("https://a.com/x?page=2&utm_c=1") ==
      Seq("https://a.com/x?page=2"))
    assert(canon("https://a.com/x?a=1&gclid=g&b=2") ==
      Seq("https://a.com/x?a=1&b=2"))
    // all-tracking query drops entirely, including the '?'
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") == Seq("https://a.com/x"))
  }

  test("canonicalizeUrl: path case is preserved; root slash survives;" +
      " non-default port survives") {
    assert(canon("HTTPS://A.com/KeepCase") == Seq("https://a.com/KeepCase"))
    assert(canon("https://a.com/") == Seq("https://a.com/"))
    assert(canon("https://a.com:8443/x") == Seq("https://a.com:8443/x"))
    // :443 on http is NOT a default port
    assert(canon("http://a.com:443/x") == Seq("http://a.com:443/x"))
  }

  // ---- chiSquare -------------------------------------------------------------

  test("chiSquare: perfectly dependent 2x2 has chi2 = n (ppm-scaled)") {
    // a==b always: chi2 = n for a 2x2 with equal marginals
    val df = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("chi2_ppm") == 20L * 1000000L)
  }

  test("chiSquare: independent uniform grid has chi2 = 0") {
    val df = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").collect().head
    assert(r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Long]("chi2_ppm") == 0L)
  }

  test("chiSquare: zero-observed cells still contribute expected mass") {
    // a=x only with b=p, a=y only with b=q -> both zero cells count
    val df = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").collect().head
    assert(r.getAs[Long]("chi2_ppm") == 10L * 1000000L) // perfect dependence
  }

  // ---- benford ---------------------------------------------------------------

  test("benford: digits come from the decimal string; ppm shares exact") {
    val df = (Seq.fill(3)(123L) ++ Seq.fill(2)(20L) ++ Seq(999L, 0L, -5L))
      .toDF("v")
    val out = Stats.benford(df, "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("obs_ppm")))).toMap
    // 0 and -5 are excluded; total 6
    assert(out == Map(1 -> ((3L, 500000L)), 2 -> ((2L, 333333L)),
      9 -> ((1L, 166666L))))
  }

  test("benford: expectation column matches log10(1 + 1/d) in ppm") {
    val df = (1L to 9L).toDF("v")
    val out = Stats.benford(df, "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("exp_ppm")).toMap
    assert(out(1) == math.floor(1e6 * math.log10(2.0)).toLong)
    assert(out(9) == math.floor(1e6 * math.log10(10.0 / 9.0)).toLong)
    // nine floored ppm terms each lose < 1 ppm; the exact floored sum
    assert(out.values.sum == 999995L)
  }

  // ---- gini ------------------------------------------------------------------

  test("gini: perfect equality is 0; single-holder concentration -> (n-1)/n") {
    val eq = Seq.fill(4)(("a", 25L)) ++
      Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 100L))
    val out = Stats.gini(eq.toDF("g", "v"), Seq("g"), "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(out("a") == 0.0)
    assert(out("b") == 0.75) // (n-1)/n with n=4
  }

  test("gini: hand-computed mixed case and zero-sum null") {
    // values 1,2,3,4: sum=10, sum(i*v)=1+4+9+16=30
    // G = 2*30/(4*10) - 5/4 = 1.5 - 1.25 = 0.25
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L),
      ("z", 0L), ("z", 0L)).toDF("g", "v")
    val out = Stats.gini(df, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> Option(r.get(r.fieldIndex("gini")))).toMap
    assert(out("g").contains(0.25))
    assert(out("z").isEmpty)
  }

  // ---- cohenKappa ------------------------------------------------------------

  test("cohenKappa: perfect agreement is 1, simple hand case matches") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val r1 = Stats.cohenKappa(perfect, "a", "b").collect().head
    assert(r1.getAs[Long]("agree") == 3L && r1.getAs[Double]("kappa") == 1.0)
    // classic 2x2: agree 15 of 20; rt = (12, 8), ct = (11, 9)
    // pe_n2 = 12*11 + 8*9 = 204; kappa = (15*20 - 204)/(400 - 204) = 96/196
    val hand = (Seq.fill(9)(("p", "p")) ++ Seq.fill(3)(("p", "q")) ++
      Seq.fill(2)(("q", "p")) ++ Seq.fill(6)(("q", "q"))).toDF("a", "b")
    val r2 = Stats.cohenKappa(hand, "a", "b").collect().head
    assert(r2.getAs[Long]("n") == 20L && r2.getAs[Long]("agree") == 15L)
    assert(r2.getAs[Double]("kappa") == 96.0 / 196.0)
  }

  test("cohenKappa: both sides constant -> kappa null (pe = 1)") {
    val df = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = Stats.cohenKappa(df, "a", "b").collect().head
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("cohenKappa: disjoint label sets -> pe 0, kappa = po") {
    val df = Seq(("x", "u"), ("y", "v")).toDF("a", "b")
    val r = Stats.cohenKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("agree") == 0L && r.getAs[Double]("kappa") == 0.0)
  }

  // ---- rankEval --------------------------------------------------------------

  private def rl(rows: (Long, Long, Int)*) =
    rows.toDF("qid", "id", "rank")

  test("rankEval: identical rankings score perfect at every cutoff") {
    val l = rl((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val out = Relevance.rankEval(l, l, Seq(1, 3)).collect()
      .map(r => r.getAs[Int]("k") -> ((r.getAs[Long]("recall_ppm"),
        r.getAs[Long]("mrr_ppm"), r.getAs[Long]("ndcg_ppm")))).toMap
    assert(out(1) == ((1000000L, 1000000L, 1000000L)))
    assert(out(3) == ((1000000L, 1000000L, 1000000L)))
  }

  test("rankEval: hand-computed partial overlap") {
    // truth 10,11,12; cand 11,99,10: at k=3 hits = 2 (10@3, 11@1)
    // recall = 2/3 -> 666666 ppm; first relevant cand rank 1 -> mrr 1e6
    // dcg = w(1) + w(3); idcg = w(1)+w(2)+w(3) with w(r)=floor(1e9/ln(r+1))
    val truth = rl((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val cand = rl((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3))
    val r = Relevance.rankEval(truth, cand, Seq(3)).collect().head
    def w(x: Int) = math.floor(1e9 / math.log(x + 1.0)).toLong
    assert(r.getAs[Long]("recall_ppm") == 666666L)
    assert(r.getAs[Long]("mrr_ppm") == 1000000L)
    assert(r.getAs[Long]("ndcg_ppm") ==
      (w(1) + w(3)) * 1000000L / (w(1) + w(2) + w(3)))
  }

  test("rankEval: zero-overlap queries still average into the mean") {
    val truth = rl((1L, 10L, 1), (2L, 20L, 1))
    val cand = rl((1L, 10L, 1), (2L, 99L, 1)) // query 2 misses entirely
    val r = Relevance.rankEval(truth, cand, Seq(1)).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("recall_ppm") == 500000L)
    assert(r.getAs[Long]("mrr_ppm") == 500000L)
    assert(r.getAs[Long]("ndcg_ppm") == 500000L)
    intercept[IllegalArgumentException] {
      Relevance.rankEval(truth, cand, Seq.empty)
    }
  }

  test("rankEval: MRR uses the full candidate list beyond the cutoff") {
    // truth@1 = {10}; cand has 10 at rank 4: recall@1 = 0 but rr = 1/4
    val truth = rl((1L, 10L, 1), (1L, 11L, 2))
    val cand = rl((1L, 50L, 1), (1L, 51L, 2), (1L, 52L, 3), (1L, 10L, 4))
    val r = Relevance.rankEval(truth, cand, Seq(1)).collect().head
    assert(r.getAs[Long]("recall_ppm") == 0L)
    assert(r.getAs[Long]("mrr_ppm") == 250000L)
  }

  // ---- fdViolations ----------------------------------------------------------

  test("fdViolations: a held FD reports zero violations") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "d")
    val r = Expectations.fdViolations(df, Seq("k"), Seq("d")).collect().head
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating"),
      r.getAs[Long]("max_variants")) == ((2L, 0L, 1L)))
  }

  test("fdViolations: violating keys and the worst key's variant count") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "x"), (3, "y"), (3, "y"),
      (3, "z")).toDF("k", "d")
    val r = Expectations.fdViolations(df, Seq("k"), Seq("d")).collect().head
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating"),
      r.getAs[Long]("max_variants")) == ((3L, 2L, 3L)))
    intercept[IllegalArgumentException] {
      Expectations.fdViolations(df, Seq("k"), Seq("k"))
    }
  }
}
