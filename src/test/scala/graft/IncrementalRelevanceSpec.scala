package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalRelevance, Relevance}
import graft.storage.VersionedTable

class IncrementalRelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val terms = Seq("spark", "merge", "window")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("incr_bm25").toString

  private def corpus(dir: String) =
    Tables(spark, dir, "documents").select("doc_id", "text")

  /** (id -> (rounded score, hits)) from any (doc_id, score, n_terms_hit). */
  private def scored(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Long)] =
    df.select(col("doc_id"), round(col("score"), 6).as("s"), col("n_terms_hit"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

  test("two-batch build equals batch BM25 exactly; refresh is exactly-once") {
    val root = tmp()
    val docs = corpus("/root/testdata/sf0.001")
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val idx = IncrementalRelevance(spark, src, s"$root/idx", "text", "doc_id")
    src.append(docs.filter(col("doc_id") % 2 === 0))
    assert(idx.refresh() == 1L)
    src.append(docs.filter(col("doc_id") % 2 =!= 0))
    assert(idx.refresh() == 1L)
    assert(idx.refresh() == 0L) // already current
    val want = scored(Relevance.bm25(docs, "text", "doc_id", terms))
    val got = scored(idx.score(terms))
    assert(got == want)
    // corpus constants match the batch formulation
    assert(idx.nDocs == docs.count())
    val wantDl = docs.agg(sum(size(split(lower(trim(col("text"))), "\\s+"))))
      .head.getLong(0)
    assert(idx.sumDl == wantDl)
  }

  test("deletes are exact — no rebuild: postings cancel and constants shrink") {
    val root = tmp()
    val docs = corpus("/root/testdata/sf0.001")
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val idx = IncrementalRelevance(spark, src, s"$root/idx", "text", "doc_id")
    src.append(docs)
    idx.refresh()
    src.deleteWhere(col("doc_id") % 5 === 0)
    assert(idx.refresh() == 1L)
    val remaining = docs.filter(col("doc_id") % 5 =!= 0)
    assert(scored(idx.score(terms)) ==
      scored(Relevance.bm25(remaining, "text", "doc_id", terms)))
    assert(idx.nDocs == remaining.count())
  }

  test("update = delete+insert in one window cancels the old dl group") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val idx = IncrementalRelevance(spark, src, s"$root/idx", "text", "doc_id")
    src.append(Seq((1L, "spark window spark"), (2L, "merge merge"))
      .toDF("doc_id", "text"))
    idx.refresh()
    // rewrite doc 1: different text, different length
    src.deleteWhere(col("doc_id") === 1L)
    src.append(Seq((1L, "merge")).toDF("doc_id", "text"))
    idx.refresh()
    val finalDocs = Seq((1L, "merge"), (2L, "merge merge")).toDF("doc_id", "text")
    assert(scored(idx.score(terms)) ==
      scored(Relevance.bm25(finalDocs, "text", "doc_id", terms)))
    // doc 1's old postings net to zero — they must not reach the probe
    val net = idx.postingsFor(Seq("spark", "window"))
    assert(net.count() == 0L)
    assert(idx.nDocs == 2L && idx.sumDl == 3L)
  }

  test("scoreTopK ordering contract and layout partitioning") {
    val root = tmp()
    val docs = corpus("/root/testdata/sf0.001")
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val idx = IncrementalRelevance(spark, src, s"$root/idx", "text", "doc_id",
      layoutPartitions = 4)
    src.append(docs)
    idx.refresh()
    val top = idx.scoreTopK(terms, 10).collect()
    assert(top.length == 10)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // clustered layout: the delta landed as multiple term-range PARTS,
    // and a term-pruned read provably skips parts outside its range
    val t = VersionedTable(spark, s"$root/idx/postings")
    assert(t.state.get.parts.size > 1)
    val (kept, total) = t.pruneStats(col("term").isin(terms: _*))
    assert(kept < total, s"term pruning inert: kept $kept of $total parts")
  }
}
