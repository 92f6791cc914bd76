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
}
