package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // 3-grams for the fixture so overlaps are easy to construct by hand
  private val N = 3

  private def corpus = Seq(
    (1L, "the quick brown fox jumps"),        // shares "the quick brown" with bench
    (2L, "a completely different document"),   // clean
    (3L, "brown fox jumps high today"),        // shares "brown fox jumps"
    (4L, "short doc"),                         // under n tokens — never matches
    (5L, "The QUICK   brown\tcat"),            // case/whitespace-normalized match
    (6L, null.asInstanceOf[String])            // null text — clean
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "the quick brown fox jumps over")
  ).toDF("doc_id", "text")

  test("contaminatedIds flags exactly the docs sharing an n-gram; clean removes them") {
    val bad = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", N)
      .as[Long].collect().toSet
    assert(bad == Set(1L, 3L, 5L))
    val clean = Decontaminate.clean(corpus, bench, "doc_id", "text", N)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L, 6L))
    val flags = Decontaminate.flagged(corpus, bench, "doc_id", "text", N)
      .select("doc_id", "is_contaminated").as[(Long, Boolean)].collect().toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false))
  }

  test("benchmark grams are exact strings — substring overlap does not contaminate") {
    // "quick brown foxtrot" shares two WORDS but no full 3-gram
    val c = Seq((7L, "quick brown foxtrot dance")).toDF("doc_id", "text")
    assert(Decontaminate.contaminatedIds(c, bench, "doc_id", "text", N).count() == 0)
  }

  test("plan: benchmark grams broadcast into a LEFT SEMI join — corpus side has no exchange") {
    val ids = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", N)
    val p = ids.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // corpus side streams into the join (explode below the join in the
    // tree); the only hash exchange is the distinct on the RARE id output,
    // above the join — the corpus is never shuffled
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val gen = p.indexOf("Generate explode")
    assert(gen > joinIdx, "corpus explode must be the join's streamed child")
    // streamed branch = between the join node and its BroadcastExchange
    // build side; the benchmark-side distinct may shuffle (it's tiny), the
    // corpus side must not
    val streamed = p.substring(joinIdx, p.indexOf("BroadcastExchange", joinIdx))
    assert(!streamed.contains("Exchange"),
      s"no shuffle may sit between the corpus scan and the semi join:\n$streamed")
  }
}
