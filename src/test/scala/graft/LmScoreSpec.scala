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
}
