package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relevance

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark catalyst optimizer"),
    (2L, "spark appears once in this considerably longer document " +
      "padded with many many extra filler words to stretch length"),
    (3L, "completely unrelated text about gardens"),
    (4L, "rare unique marker word here")
  ).toDF("doc_id", "text")

  test("bm25: only matching docs, higher tf ranks higher, saturation bounded") {
    val out = Relevance.bm25(corpus, "text", "doc_id", Seq("spark"))
      .orderBy(desc("score")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L)) // 3,4 never match
    assert(out.head.getLong(0) == 1L) // tf=3 short doc beats tf=1 long doc
    assert(out.forall(_.getDouble(1) > 0))
    // k1 saturation: tripling tf must not triple the score
    val s1 = out.head.getDouble(1); val s2 = out.last.getDouble(1)
    assert(s1 < 3 * s2)
  }

  test("bm25: rare term outscores common term (idf)") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"), (4L, "common z")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25(docs, "text", "doc_id", Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 hits both; its margin over any common-only doc is the rare idf
    assert(out(1L) > out(2L))
    val hits = Relevance.bm25(docs, "text", "doc_id", Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hits(1L) == 2L && hits(2L) == 1L)
  }

  test("bm25: duplicate query terms are treated as a set (no df double-count)") {
    // repeated term once doubled df past N -> negative idf; pin set semantics
    val dup = Relevance.bm25(corpus, "text", "doc_id", Seq("spark", "spark", "gardens"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val set = Relevance.bm25(corpus, "text", "doc_id", Seq("spark", "gardens"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(dup == set)
    assert(dup.values.forall(_._1 > 0)) // no negative-idf scores
    assert(dup(1L)._2 == 1L) // n_terms_hit counts distinct terms
  }

  test("rrfFuse: hand-computed fusion, missing-from-one-list ids contribute once") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Relevance.rrfFuse(Seq(a, b), "id", k = 60)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(out(1L)._1 - 1.0 / 61) < 1e-12 && out(1L)._2 == 1L)
    assert(math.abs(out(2L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-12 && out(2L)._2 == 2L)
    assert(math.abs(out(4L)._1 - 1.0 / 62) < 1e-12)
    // the doc in both lists outranks a single-list rank-1 doc (the RRF point)
    assert(out(2L)._1 > out(1L)._1)
  }

  test("tfidf matches the manual formula; minDf prunes rare terms") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "a d")
    ).toDF("doc_id", "text")
    val all = Relevance.tfidf(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // term a: df=3, N=3 -> idf=ln(1)=0 everywhere
    assert(all((1L, "a"))._3 == 0.0 && all((1L, "a"))._1 == 2L)
    // term b: tf=1, df=1 -> tfidf = ln(3)
    assert(math.abs(all((1L, "b"))._3 - math.log(3.0)) < 1e-12)
    val pruned = Relevance.tfidf(docs, "text", "doc_id", minDf = 2L)
      .select("term").distinct().collect().map(_.getString(0)).toSet
    assert(pruned == Set("a"))
  }

  test("pmiBigrams matches the manual formula; minCount floors rare pairs") {
    // corpus: "x y" appears 3 times adjacent; tokens: x:3 y:3 z:2
    // M = 8 tokens, N = 5 bigrams; pmi(x y) = ln((3*8*8)/(3*3*5))
    val docs = Seq(
      (1L, "x y z"), (2L, "x y"), (3L, "x y z")
    ).toDF("doc_id", "text")
    val rows = Relevance.pmiBigrams(docs, "text", minCount = 3L).collect()
    assert(rows.length == 1, rows.mkString(";")) // only (x,y) reaches count 3
    val r = rows.head
    assert(r.getString(0) == "x y" && r.getLong(1) == 3L)
    val expect = BigDecimal(math.log((3.0 * 8 * 8) / (3.0 * 3 * 5)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expect, s"${r.getDouble(2)} vs $expect")
    // minCount=2 admits (y,z) with c12=2: pmi = ln((2*8*8)/(3*2*5))
    val two = Relevance.pmiBigrams(docs, "text", minCount = 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two == Map("x y" -> 3L, "y z" -> 2L))
    // degenerate docs contribute nothing and never throw
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "solo"))
      .toDF("doc_id", "text")
    assert(Relevance.pmiBigrams(edge, "text", minCount = 1L).count() == 0)
  }

  test("bm25 plan: corpus-sized side never shuffles more than the tokenize agg; df/stats broadcast") {
    val plan = Relevance.bm25(Tables(spark, "/root/testdata/sf0.001", "documents"),
      "text", "doc_id", Seq("spark", "merge")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("proximity: min token distance, occurrence counts, single-term docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "data x y stream more data"),       // |2-4|=2, |6-4|=2 -> 2
      (2L, "stream data"),                     // adjacent -> 1
      (3L, "data only here"),                  // no 'stream' -> absent
      (4L, "stream alone"),                    // no 'data' -> absent
      (5L, "data data stream stream")          // |2-3|=1
    ).toDF("doc_id", "text")
    val got = Relevance.proximity(docs, "text", "doc_id", "data", "stream")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(1L, 2L, 5L))
    assert(got(1L) == ((2, 2L, 1L)))
    assert(got(2L) == ((1, 1L, 1L)))
    assert(got(5L) == ((1, 2L, 2L)))
  }

  test("pagerank: hand-computed fixed-point ranks on a tiny graph; deterministic") {
    import spark.implicits._
    // A->B, A->C, B->C: after 1 iter (scale 1e9):
    //   contrib A->B = A->C = (1e9*85) div 200 = 425000000
    //   contrib B->C = (1e9*85) div 100 = 850000000
    //   B = 150000000 + 425000000; C = 150000000 + 425000000 + 850000000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = graft.operators.PageRank.scaledRanks(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) == 150000000L)              // nothing points at A
    assert(r1(2L) == 575000000L)
    assert(r1(3L) == 1425000000L)
    val r3a = graft.operators.PageRank.scaledRanks(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r3b = graft.operators.PageRank.scaledRanks(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3a == r3b, "fixed-point ranks must be bit-deterministic")
    assert(r3a(3L) > r3a(2L) && r3a(2L) > r3a(1L), "authority ordering")
  }

  test("vocabCoverage: cumulative coverage at each k, ties by token string") {
    // counts: w 4, x 2, y 2, z 1 -> ranked (w, x, y, z); total 9
    val docs = Seq("w w x y", "w x y", "w z").toDF("text")
    val out = graft.operators.Relevance.vocabCoverage(docs, "text",
        Seq(1, 2, 4))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1) == ((4L, 4L, 4L * 1000000 / 9)))
    assert(out(2) == ((2L, 6L, 6L * 1000000 / 9))) // x before y: count tie
    assert(out(4) == ((1L, 9L, 1000000L)))
  }
}
