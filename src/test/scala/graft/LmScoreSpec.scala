package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LmScore

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("in-domain text scores lower cross-entropy than out-of-domain and gibberish") {
    val lm = LmScore.train(docs.filter(col("lang") === "en"), "text", minCount = 2L)
    val scored = LmScore.score(docs, "text", lm)
      .groupBy("lang").agg(avg("bits_per_token").as("bpt"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("en") < scored("zh"),
      s"English LM must prefer English: $scored")
    assert(scored("en") < scored("de") && scored("en") < scored("fr"))

    val g = LmScore.score(
      Seq("zxqv qqq vvv zzz kkjhgf", "the quick brown fox").toDF("text"), "text", lm)
      .select("bits_per_token").collect().map(_.getDouble(0))
    assert(g(0) > g(1), s"gibberish must score worse: ${g.toSeq}")
  }

  test("filterByPerplexity keeps the low-entropy head; empty/null docs drop") {
    val lm = LmScore.train(docs.filter(col("lang") === "en"), "text")
    val withEdge = docs.select("text")
      .union(Seq("", "   ", null: String).toDF("text"))
    val kept = LmScore.filterByPerplexity(withEdge, "text", lm, maxBitsPerToken = 14.0)
    assert(kept.count() > 0 && kept.count() < withEdge.count())
    assert(kept.filter(col("text").isNull || length(trim(col("text"))) === 0).count() == 0)
    // threshold is monotone
    val loose = LmScore.filterByPerplexity(withEdge, "text", lm, 1000.0).count()
    val tight = LmScore.filterByPerplexity(withEdge, "text", lm, 5.0).count()
    assert(tight <= kept.count() && kept.count() <= loose)
  }

  test("bigramNll matches the hand formula; frequent transitions score lower") {
    // corpus: "a b" x3 + "a c" x1; V = 3 (a, b, c)
    // pairs: (a,b):3, (a,c):1; c1(a)=4
    // p(b|a) = (3+1)/(4+3) = 4/7 ; p(c|a) = (1+1)/(4+3) = 2/7
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")
    ).toDF("doc_id", "text")
    val got = LmScore.bigramNll(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((1L, r4(-math.log(4.0 / 7)))))
    assert(got(4L) == ((1L, r4(-math.log(2.0 / 7)))))
    // rarer transition = higher NLL
    assert(got(4L)._2 > got(1L)._2)
    // docs with <2 tokens have no transitions and drop out
    val edge = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "x y")).toDF("doc_id", "text")
    val ids = LmScore.bigramNll(edge, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(4L))
  }
}
