package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, Selection}
import graft.functions.TextFunctions

/** Corpus-selection operators (X62–X65): per-group quantile bucketing,
  * token-budget-capped selection, leakage-safe content-group split, and
  * the blocklist gate. Contracts: exact quantile_disc-rank thresholds,
  * greedy-prefix maximality, group-atomic split membership, token-exact
  * blocklist matching.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private lazy val scored = docs.select(col("lang"), col("doc_id"),
    TextFunctions.tokenCount(col("text")).cast("long").as("tok"))

  test("quantileBuckets: thresholds equal the quantile_disc rank rule") {
    val bucketed = Selection.quantileBuckets(scored, "lang", "tok",
      Seq(1 -> 3, 2 -> 3), Seq("head", "middle", "tail"))
      .select("lang", "doc_id", "tok", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    // reference: per group, sort scores, threshold = value at 1-based
    // rank ceil(q*n) — DuckDB quantile_disc semantics
    val byLang = bucketed.groupBy(_._1)
    assert(byLang.nonEmpty)
    for ((_, rows) <- byLang) {
      val sortedScores = rows.map(_._3).sorted
      val n = sortedScores.length
      def thr(num: Int, den: Int): Long =
        sortedScores((num * n + den - 1) / den - 1)
      val (t1, t2) = (thr(1, 3), thr(2, 3))
      for ((_, _, tok, bucket) <- rows) {
        val want = if (tok <= t1) "head" else if (tok <= t2) "middle" else "tail"
        assert(bucket == want, s"tok=$tok t1=$t1 t2=$t2")
      }
      // every bucket non-empty on this data, and ties never straddle
      assert(rows.map(_._4).distinct.length == 3 || sortedScores.distinct.length < 3)
      for ((_, g) <- rows.groupBy(_._3))
        assert(g.map(_._4).distinct.length == 1, "tie straddled buckets")
    }
  }

  test("quantileBuckets: corpus rows never ride a sort (histogram-only window)") {
    val plan = Selection.quantileBuckets(scored, "lang", "tok",
      Seq(1 -> 3, 2 -> 3), Seq("head", "middle", "tail"))
      .queryExecution.executedPlan.toString
    // the only Sort feeds the histogram window: its input is the
    // (lang, tok, count) aggregate, so no sort line may carry doc_id
    val sortLines = plan.split("\n").filter(_.contains("Sort "))
    assert(sortLines.nonEmpty, plan)
    assert(sortLines.forall(!_.contains("doc_id")), sortLines.mkString("\n"))
  }

  test("bucketsFromHistogram: self-histogram equals quantileBuckets; " +
    "external state shifts thresholds") {
    val hist = scored.groupBy(col("lang"), col("tok").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val viaState = Selection.bucketsFromHistogram(scored, hist,
        "lang", "v", "cnt", "tok", Seq(1 -> 3, 2 -> 3),
        Seq("head", "middle", "tail"))
      .select("lang", "doc_id", "bucket")
    val direct = Selection.quantileBuckets(scored, "lang", "tok",
        Seq(1 -> 3, 2 -> 3), Seq("head", "middle", "tail"))
      .select("lang", "doc_id", "bucket")
    assert(viaState.except(direct).isEmpty && direct.except(viaState).isEmpty)
    // a state histogram of ONLY small scores pushes everything to tail
    val lowOnly = hist.filter(col("v") <= 5)
    if (lowOnly.count() > 0) {
      val shifted = Selection.bucketsFromHistogram(
        scored.filter(col("tok") > 5), lowOnly,
        "lang", "v", "cnt", "tok", Seq(1 -> 3, 2 -> 3),
        Seq("head", "middle", "tail"))
      assert(shifted.filter(col("bucket") =!= "tail").count() == 0)
    }
  }

  test("budgetCap: kept set is the maximal greedy prefix per group") {
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"),
      TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    val budget = 1500L
    val kept = Selection.budgetCap(base, "source", "n_chars", "doc_id",
        "tok", budget)
      .select("source", "doc_id", "_cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val all = base.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((src, rows) <- all.groupBy(_._1)) {
      val order = rows.sortBy(t => (-t._3, t._2)) // n_chars DESC, doc_id
      var cum = 0L
      val wantIds = scala.collection.mutable.ArrayBuffer[Long]()
      var stopped = false
      for (t <- order if !stopped) {
        if (cum + t._4 <= budget) { cum += t._4; wantIds += t._2 }
        else stopped = true // greedy PREFIX: first overflow ends the group
      }
      val gotIds = kept.filter(_._1 == src).map(_._2).toSet
      assert(gotIds == wantIds.toSet, s"group $src")
      // kept cumulative totals respect the budget
      kept.filter(_._1 == src).foreach(t => assert(t._3 <= budget))
    }
  }

  test("budgetCap: window sorts only narrow key columns, not full rows") {
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"),
      col("text"), TextFunctions.tokenCount(col("text")).cast("long").as("tok"))
    val plan = Selection.budgetCap(base, "source", "n_chars", "doc_id",
        "tok", 1500L)
      .queryExecution.executedPlan.toString
    val sortLines = plan.split("\n").filter(_.contains("Sort "))
    assert(sortLines.nonEmpty, plan)
    assert(sortLines.forall(!_.contains("text")), sortLines.mkString("\n"))
  }

  test("leakageSafeSplit: content groups are atomic; duplicates never straddle") {
    // corpus with engineered exact duplicates across many ids
    val dup = docs.limit(40).select(col("doc_id") + 100000L, col("text"))
      .toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").union(dup)
    val split = Sampling.leakageSafeSplit(corpus, "text", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2))
    // each md5(text) group maps to exactly one split
    val straddlers = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddlers == 0)
    // exhaustive + deterministic
    assert(split.count() == corpus.count())
    val again = Sampling.leakageSafeSplit(corpus, "text", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2))
    assert(split.select("doc_id", "split")
      .except(again.select("doc_id", "split")).isEmpty)
    // both splits populated at this size
    assert(split.select("split").distinct.count() == 2)
  }

  test("leakageSafeSplit: group label = splitByHash of the min-id representative") {
    val split = Sampling.leakageSafeSplit(docs, "text", "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
    val reps = docs.select(md5(col("text")).as("grp"), col("doc_id"))
      .groupBy("grp").agg(min("doc_id").as("rep"))
    val expected = Sampling.splitByHash(reps, "rep", Seq("train" -> 0.9, "val" -> 0.1))
      .select(col("grp"), col("split").as("want"))
    val joined = split.select("grp", "split").distinct
      .join(expected, "grp")
    assert(joined.filter(col("split") =!= col("want")).count() == 0)
  }

  test("blocklistHit: token-exact, case-insensitive, null/blank safe") {
    val rows = Seq(
      ("a", "this is SLOW today"),     // case-insensitive hit
      ("b", "slowly moving along"),    // substring must NOT hit
      ("c", "totally clean text"),
      ("d", ""),                       // blank → false
      ("e", null.asInstanceOf[String]),
      ("f", "spam")                    // single-token doc
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        TextFunctions.blocklistHit(col("text"), Seq("slow", "spam")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("a" -> true, "b" -> false, "c" -> false,
      "d" -> false, "e" -> false, "f" -> true))
  }

  // ---- paretoFront -------------------------------------------------------

  private def front(pts: (Long, Long)*): Set[(Long, Long)] =
    graft.operators.Selection.paretoFront(
        pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("paretoFront: staircase survives, interior points fall") {
    assert(front((1, 9), (5, 5), (9, 1), (2, 2), (4, 4), (5, 4)) ==
      Set((1L, 9L), (5L, 5L), (9L, 1L)))
  }

  test("paretoFront: same-x keeps only the max y; same-y needs max x") {
    assert(front((3, 7), (3, 9), (5, 9)) == Set((5L, 9L)))
    assert(front((3, 9), (5, 9), (6, 1)) == Set((5L, 9L), (6L, 1L)))
  }

  test("paretoFront: exact duplicates of a frontier point all survive") {
    val out = graft.operators.Selection.paretoFront(
        Seq((4L, 4L), (4L, 4L), (1L, 1L)).toDF("x", "y"), "x", "y")
      .collect()
    assert(out.length == 2 && out.forall(r => r.getLong(0) == 4))
  }

  test("paretoFront: matches the O(n^2) dominance definition on random input") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val naive = pts.filter(p => !pts.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))).toSet
    assert(front(pts: _*) == naive)
  }
}
