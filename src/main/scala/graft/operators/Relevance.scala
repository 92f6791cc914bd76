package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-grade relevance scoring over a document corpus: BM25 (the
  * Lucene/Elasticsearch default ranking function) and TF-IDF term
  * weighting, as pure DataFrame plans.
  *
  * Scale shape (the part that matters at 100 TB): the corpus-wide scan
  * filters to the QUERY TERMS before any shuffle, so the aggregated
  * relations (per-doc term frequencies, per-term document frequencies)
  * are query-sized, not corpus-sized; corpus constants (N, avg doc
  * length) reduce to one row and broadcast. The only corpus-wide work is
  * the tokenizing scan itself — one pass, map-side partial aggregation,
  * no corpus shuffle.
  */
object Relevance {

  /** Whitespace tokens, lowercased/trimmed — the same normalization the
    * rest of the text stack uses (Dedup.shingles, q48 top terms).
    */
  private def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BM25 scores for `queryTerms` over the corpus: one row per document
    * that matches at least one term — `(idCol, score, n_terms_hit)`.
    *
    * idf uses the BM25+ / Lucene form `ln(1 + (N - df + 0.5)/(df + 0.5))`
    * (always positive, no negative-idf clamp needed). `k1` saturates term
    * frequency; `b` is doc-length normalization strength.
    *
    * Cost shape: TWO pruned corpus scans — one tokenizes for the length
    * stats, one tokenizes + filters for the term hits (Spark does not
    * share a scan between plan branches without materializing it, and
    * caching the tokenized corpus would cost far more than re-scanning a
    * 2-column projection). In a standing index the length relation is
    * per-corpus, not per-query — precompute it once and pass it via
    * `lengths` to make each query a SINGLE corpus scan.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, lengths: Option[DataFrame] = None): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // (id, dl) — from the precomputed relation when supplied (any column
    // names: first = id, second = length)
    val dls = lengths.map(_.toDF(idCol, "_dl")).getOrElse(
      docs.select(col(idCol), size(tokens(col(textCol))).as("_dl")))
    // corpus constants: exact integer sums, one row, broadcast
    val stats = dls.agg(
      count(lit(1)).as("_n"),
      (sum(col("_dl")).cast("double") / count(lit(1))).as("_avgdl"))
    // term hits: filter to the query terms BEFORE the (id, term) agg —
    // everything downstream is query-sized. The doc length rides the
    // explode, so no join back to the corpus is needed.
    val tf = docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("_dl"),
        explode(col("_toks")).as("_term"))
      .filter(col("_term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("_dl"), col("_term"))
      .agg(count(lit(1)).as("_tf"))
    val df = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    tf.join(broadcast(df), "_term")
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_s",
        col("_idf") * (col("_tf") * (k1 + 1)) /
          (col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("score"), count(lit(1)).as("n_terms_hit"))
  }

  /** Top-k BM25 documents, deterministically ordered (score desc, id). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame =
    bm25(docs, textCol, idCol, queryTerms, k1, b)
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** TF-IDF weights for every (doc, term) with df ≥ `minDf` — the
    * vectorization building block (feature pipelines, keyword extraction).
    * `(idCol, term, tf, df, tfidf)`; tfidf = tf · ln(N / df).
    *
    * Unlike [[bm25]] this aggregates the FULL vocabulary: two shuffles of
    * (id, term)-granularity rows (tf agg, df agg + join back). Bound the
    * output with `minDf` (rare-term noise) before using at scale.
    */
  def tfidf(docs: DataFrame, textCol: String, idCol: String,
            minDf: Long = 1L): DataFrame = {
    val n = docs.select(count(lit(1)).as("_n"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("_n").cast("double") / col("df"))).as("tfidf"))
  }
}
