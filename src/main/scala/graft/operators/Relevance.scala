package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    // term hits: per-doc COUNTING inside the scan, not explode-then-
    // filter. Exploding every token of every document shuffles a
    // corpus-token-sized relation (~200× the doc count) just to discard
    // all but the query terms; counting each term with an array filter
    // keeps the relation doc-sized, and the explode that follows is
    // |terms|-wide per doc — measured 4× on the q55 shape. Duplicate
    // query terms are treated as a set (.distinct below): emitting one
    // struct per input element would double-count df (negative idf) and
    // score; the explode+groupBy formulation and IncrementalRelevance
    // both collapse duplicates, and this matches them.
    val perTerm = array(queryTerms.distinct.map(q =>
      struct(lit(q).as("_term"),
        size(filter(col("_toks"), x => x === lit(q))).cast("long").as("_tf"))): _*)
    val tf = docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("_dl"),
        explode(perTerm).as("_h"))
      .select(col(idCol), col("_dl"),
        col("_h._term").as("_term"), col("_h._tf").as("_tf"))
      .filter(col("_tf") > 0)
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

  /** Pointwise-mutual-information bigram mining — the phrase-discovery /
    * collocation-scoring primitive (word2vec-style phrase joining, tokenizer
    * vocabulary audits, boilerplate detection). For adjacent token pair
    * (w1, w2): `pmi = ln( p(w1,w2) / (p(w1)·p(w2)) )` with
    * `p(w1,w2) = c12/N` (N = corpus bigram count) and `p(w) = c/M`
    * (M = corpus token count), i.e. `ln((c12·M·M)/(c1·c2·N))`.
    *
    * Returns `(bigram, c12, pmi_r)` for pairs with `c12 >= minCount`
    * (the standard guard against unstable PMI on rare pairs); `pmi_r` is
    * rounded to 4 decimals for cross-engine comparability.
    *
    * Scale shape: the corpus scan explodes to adjacent pairs via a
    * zip-with over the token array (no self-join, no window); both
    * aggregations are map-side-partial wordcount shuffles bounded by
    * vocabulary size (bigram relation ≤ vocab², in practice corpus-sized
    * at worst); the unigram joins key on each bigram's parts — vocab-sized
    * relations AQE broadcasts when small; the two corpus constants reduce
    * to one row each and broadcast. Full text never rides any exchange.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5L): DataFrame = {
    val toks = docs
      .select(tokens(col(textCol)).as("_w"))
      .filter(col("_w").isNotNull)
    val uni = toks.select(explode(col("_w")).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val m = uni.agg(sum(col("_c")).as("_m")) // total tokens, 1 row
    // adjacent pairs: zip the array against itself shifted by one — a
    // doc with k tokens emits exactly k-1 pairs, empty/1-token docs none
    val bi = toks
      .select(explode(zip_with(
        slice(col("_w"), lit(1), greatest(size(col("_w")) - 1, lit(0))),
        slice(col("_w"), lit(2), greatest(size(col("_w")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_p"))
      .select(col("_p.w1").as("_w1"), col("_p.w2").as("_w2"))
      .groupBy(col("_w1"), col("_w2")).agg(count(lit(1)).as("c12"))
    val n = bi.agg(sum(col("c12")).as("_n")) // total bigrams, 1 row
    bi.filter(col("c12") >= minCount)
      .join(uni.select(col("_t").as("_w1"), col("_c").as("_c1")), "_w1")
      .join(uni.select(col("_t").as("_w2"), col("_c").as("_c2")), "_w2")
      .crossJoin(broadcast(m))
      .crossJoin(broadcast(n))
      .select(
        concat_ws(" ", col("_w1"), col("_w2")).as("bigram"),
        col("c12"),
        // exact expression shape shared with the DuckDB oracle:
        // (c12_d * M * M) / (c1_d * c2 * N), then round(·, 4)
        round(log((col("c12").cast("double") * col("_m") * col("_m")) /
          (col("_c1").cast("double") * col("_c2") * col("_n"))), 4)
          .as("pmi_r"))
  }

  /** Top-k PMI bigrams, deterministically ordered (pmi desc, bigram). */
  def pmiTopK(docs: DataFrame, textCol: String, k: Int,
              minCount: Long = 5L): DataFrame =
    pmiBigrams(docs, textCol, minCount)
      .orderBy(desc("pmi_r"), col("bigram"))
      .limit(k)

  /** TF-IDF weights for every (doc, term) with df ≥ `minDf` — the
    * vectorization building block (feature pipelines, keyword extraction).
    * `(idCol, term, tf, df, tfidf)`; tfidf = tf · ln(N / df).
    *
    * Unlike [[bm25]] this aggregates the FULL vocabulary: two shuffles of
    * (id, term)-granularity rows (tf agg, df agg + join back). Bound the
    * output with `minDf` (rare-term noise) before using at scale.
    */
  /** Reciprocal Rank Fusion (Cormack/Clarke/Büttcher 2009): fuse any
    * number of ranked retrieval lists by `Σ 1/(k + rank_i)` — the
    * standard robust hybrid-fusion rule (score scales never have to be
    * calibrated against each other, unlike a weighted score sum). Each
    * input carries (`idCol`, `rank`) with rank 1-based; ids missing from
    * a list contribute 0 for it.
    *
    * Scale shape: the inputs are top-k lists (k rows each — produce them
    * with orderBy+limit, which plans as TakeOrderedAndProject, and rank
    * the k survivors), so the union + groupBy here is k·lists-sized; no
    * corpus-sized relation ever reaches this operator.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 0, "k must be non-negative")
    lists.map(_.select(col(idCol),
        (lit(1.0) / (lit(k) + col("rank"))).as("_c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("rrf"), count(lit(1)).as("n_lists"))
  }

  /** Retrieval quality evaluation — recall@k, MRR and (ln-weighted)
    * nDCG@k of a candidate ranking against a ground-truth ranking, the
    * offline harness that answers "how much quality does the cheap
    * retrieval path (quantized / LSH / IVF) lose vs exact". Inputs carry
    * `(qid, id, rank)` with rank 1-based; the truth top-k is the
    * relevance set at each cutoff. One row per cutoff k:
    * `k, n_queries, recall_ppm, mrr_ppm, ndcg_ppm` — every metric an
    * EXACT integer:
    *
    *  - recall@k  = |cand@k ∩ truth@k| · 10⁶ div k, averaged by integer
    *    division over all truth queries (misses count as 0);
    *  - RR        = 10⁶ div (first candidate rank holding ANY truth@k
    *    doc, full candidate list), 0 when none;
    *  - DCG@k     = Σ_{hits, rc ≤ k} floor(10⁹ / ln(rc+1)) — the
    *    ln-weighted gain variant, so each term is a floored long (a
    *    float DCG sum would be order-dependent; the X110 Adamic-Adar
    *    precedent) — normalized by the same-shaped ideal sum via
    *    integer division.
    *
    * Scale shape: both inputs are top-k lists (queries × k rows), so
    * everything here is evaluation-set-sized: one equi-join on
    * (qid, id), one grouped agg, one cutoff explode (|ks| copies).
    */
  def rankEval(truth: DataFrame, cand: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "cutoffs must be >= 1")
    val t = truth.select(col("qid"), col("id"), col("rank").as("_rt"))
    val c = cand.select(col("qid"), col("id"), col("rank").as("_rc"))
    val kCol = explode(array(ks.map(lit): _*)).as("k")
    // matched (truth, cand) docs, one copy per cutoff where truth-relevant
    val j = t.join(c, Seq("qid", "id"))
      .select(col("qid"), col("_rt"), col("_rc"), kCol)
      .filter(col("_rt") <= col("k"))
    val per = j.groupBy(col("qid"), col("k"))
      .agg(count(when(col("_rc") <= col("k"), 1)).as("_hits"),
        min(col("_rc")).as("_minrc"),
        coalesce(sum(when(col("_rc") <= col("k"),
          floor(lit(1e9) / log(col("_rc").cast("double") + 1d)))), lit(0L))
          .as("_dcg"))
    // every (truth query, k) cell, including zero-overlap queries
    val grid = t.select(col("qid")).distinct().select(col("qid"), kCol)
    val idcg = aggregate(sequence(lit(1), col("k")), lit(0L),
      (acc, r) => acc + floor(lit(1e9) / log(r.cast("double") + 1d)))
    grid.join(per, Seq("qid", "k"), "left")
      .withColumn("_idcg", idcg) // exact long, so `div` stays integral
      .select(col("k"),
        expr("coalesce(_hits, 0) * 1000000 div k").as("_r_ppm"),
        coalesce(expr("1000000 div _minrc"), lit(0L)).as("_rr_ppm"),
        expr("coalesce(_dcg, 0) * 1000000 div _idcg").as("_n_ppm"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(_r_ppm) div count(1)").as("recall_ppm"),
        expr("sum(_rr_ppm) div count(1)").as("mrr_ppm"),
        expr("sum(_n_ppm) div count(1)").as("ndcg_ppm"))
  }

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

  /** Term-proximity scoring: per document, the MINIMUM token distance
    * between any occurrence of `termA` and any occurrence of `termB`
    * (lowercased whitespace tokens, 1-based positions) — the phrase/
    * nearness signal BM25 lacks. Docs containing only one of the terms
    * are absent from the result.
    *
    * Scale shape: positions for the TWO QUERY TERMS only ride the
    * shuffle (the corpus explodes to term-position rows, but the filter
    * keeps ≈ docfreq(A)+docfreq(B) rows — the scan is map-only before
    * it). The per-doc pairing is |A-positions|×|B-positions| of the SAME
    * document — quadratic only in a single doc's occurrence counts of
    * the two query terms, which is the standard proximity-query trade;
    * cap pathological docs upstream (repeatedNgramScrub) if needed.
    */
  def proximity(docs: DataFrame, textCol: String, idCol: String,
                termA: String, termB: String): DataFrame = {
    val pos = docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("p", "term")))
      .filter(col("term").isin(termA, termB))
      .select(col(idCol), (col("p") + 1).as("p"), col("term"))
    val a = pos.filter(col("term") === termA).select(col(idCol), col("p").as("pa"))
    val b = pos.filter(col("term") === termB).select(col(idCol), col("p").as("pb"))
    a.join(b, Seq(idCol))
      .groupBy(col(idCol))
      .agg(min(abs(col("pa") - col("pb"))).as("min_dist"),
        countDistinct(col("pa")).as("n_a"),
        countDistinct(col("pb")).as("n_b"))
  }

  /** Vocabulary coverage curve — for each candidate vocab size k: how
    * many token OCCURRENCES the top-k most frequent types cover
    * (`cov_ppm`, exact integer ppm) and the k-th type's frequency. The
    * tokenizer-budget question (how big a vocab before <1% of the
    * stream is OOV) answered from corpus statistics, not trial
    * tokenizer training. Ranking ties break by token string ascending —
    * deterministic on both engines.
    *
    * Scale shape: tokens collapse to the type-DOMAIN count relation
    * map-side; the cumulative sum is one ordered window over types
    * (vocabulary-sized, not occurrence-sized). Whitespace tokenization
    * on lowercased text (the [[bm25]] tokenizer).
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks=$ks")
    val spark = docs.sparkSession
    val counts = docs.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("_c"))
    val w = Window.orderBy(desc("_c"), col("tok"))
    val ranked = counts
      .withColumn("_rank", row_number().over(w))
      .withColumn("_cum", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_total", sum(col("_c")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    import spark.implicits._
    ranked.join(broadcast(ks.toDF("k")), col("_rank") === col("k"))
      .select(col("k"), col("_c").as("kth_count"),
        col("_cum").as("covered"), col("_total").as("total_tokens"),
        expr("_cum * 1000000 div _total").as("cov_ppm"))
      .orderBy(col("k"))
  }
}
