package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityFilter
import graft.operators.QualityFilter.Config

class QualityFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val cfg = Config(minWords = 3, maxWords = 10, minStopwordHits = 1)

  private def flagsOf(docs: Seq[(Long, String)]): Map[Long, (Boolean, String)] =
    QualityFilter.flags(docs.toDF("doc_id", "text"), "text", cfg)
      .select("doc_id", "passed", "reasons").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap

  test("clean doc passes with empty reasons") {
    val m = flagsOf(Seq(1L -> "the quick brown fox jumps"))
    assert(m(1L) == ((true, "")))
  }

  test("word-count bounds fire on both sides; blank fails word_count only") {
    val m = flagsOf(Seq(
      1L -> "the cat",                                        // 2 < minWords
      2L -> ("the " + Seq.fill(11)("word").mkString(" ")),    // 12 > maxWords
      3L -> "", 4L -> "   "))
    assert(m(1L) == ((false, "word_count")))
    assert(m(2L) == ((false, "word_count")))
    assert(m(3L) == ((false, "word_count")))
    assert(m(4L) == ((false, "word_count")))
  }

  test("mean word length: too short and too long both fail") {
    val m = flagsOf(Seq(
      1L -> "the a b c d",                       // mean (3+1+1+1+1)/5 < 3
      2L -> "the abcdefghijklmnopq abcdefghijklmnopq"))  // mean > 10
    assert(!m(1L)._1 && m(1L)._2.contains("mean_word_len"))
    assert(!m(2L)._1 && m(2L)._2.contains("mean_word_len"))
  }

  test("alpha ratio fails on number-heavy docs") {
    val m = flagsOf(Seq(1L -> "the 123 456 789 000"))
    assert(m(1L)._2.contains("alpha_ratio"))
  }

  test("stopword rule fails when no stoplist token appears") {
    val m = flagsOf(Seq(1L -> "quick brown fox jumps high"))
    assert(m(1L) == ((false, "stopword_hits")))
  }

  test("symbol ratio counts # chars and ... runs") {
    val m = flagsOf(Seq(
      1L -> "the ### ### tag spam",
      2L -> "the story trails off... and... on..."))
    assert(m(1L)._2.contains("symbol_ratio"))
    assert(m(2L)._2.contains("symbol_ratio"))
  }

  test("line rules: bullet-dominated and ellipsis-trailing docs fail") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val ell = "the start\nof lines...\nthat trail...\nbadly..."
    val m = flagsOf(Seq(1L -> ("the\n" + bullets), 2L -> ell))
    assert(m(1L)._2.contains("bullet_lines"))
    assert(m(2L)._2.contains("ellipsis_lines"))
  }

  test("reasons list multiple failures alphabetically; keep preserves schema") {
    val m = flagsOf(Seq(1L -> "999 888"))
    assert(m(1L) == ((false, "alpha_ratio,stopword_hits,word_count")))
    val df = Seq((1L, "the quick brown fox jumps", "s1"),
      (2L, "no", "s2")).toDF("doc_id", "text", "source")
    val kept = QualityFilter.keep(df, "text", cfg)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("q83 catalog query: counts reconcile per source") {
    val dir = "/root/testdata/sf0.001"
    val rows = Queries.q83QualityFilter(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_pass") <= n)
      val fails = Seq("f_alpha", "f_mwl", "f_stop", "f_sym", "f_wc")
        .map(r.getAs[Long])
      fails.foreach(f => assert(f <= n))
      // a failing rule implies a non-passing doc: pass + max-fail ≤ n
      assert(r.getAs[Long]("n_pass") + fails.max <= n)
    }
    // the whole stage must stay map-side: no shuffle of text
    val plan = Queries.q83QualityFilter(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), "no sort expected in a flags+agg plan")
  }
}
