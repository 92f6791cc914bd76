package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality scoring: train a unigram LM on a
  * reference ("good") corpus, score candidate documents by per-token
  * cross-entropy — low bits-per-token ≈ looks like the reference, high ≈
  * out-of-domain or garbage. The standard perplexity filter between
  * heuristic gates and expensive model-based ones.
  *
  * Scale design:
  *  - Training is ONE aggregation (word → count) with a `minCount` floor:
  *    the kept vocabulary is bounded (Zipf does the work — rare words
  *    fall to the floor), so the model broadcasts as a plain map.
  *  - Unseen words get add-one smoothing over the floored tail, so scores
  *    are total and finite.
  *  - Scoring is a stateless partition-local map — no shuffle, any size.
  *
  * Tokenization matches the engine's text surface:
  * `split(lower(trim(text)), "\s+")`.
  */
object LmScore {

  /** A trained unigram model: log2 probabilities + the unseen penalty. */
  final case class UnigramLm(logProb: Map[String, Double], unseenLogProb: Double) {
    /** bits-per-token cross-entropy of one document; None for empty docs */
    def bitsPerToken(text: String): Option[Double] = {
      if (text == null) return None
      val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (words.isEmpty) return None
      var s = 0.0
      var i = 0
      while (i < words.length) {
        s -= logProb.getOrElse(words(i), unseenLogProb)
        i += 1
      }
      Some(s / words.length)
    }
  }

  /** Train on the reference corpus. `minCount` floors the vocabulary —
    * words below it pool into the unseen mass — and `maxVocab` HARD-CAPS
    * the driver-side model at the top-`maxVocab` words by count
    * (deterministic tie-break), so the collect is bounded no matter how
    * the corpus is shaped. Zipf means the cap costs almost no mass.
    */
  def train(reference: DataFrame, textCol: String, minCount: Long = 2L,
            maxVocab: Int = 1000000): UnigramLm = {
    require(minCount >= 1 && maxVocab >= 1, "need minCount >= 1, maxVocab >= 1")
    val spark = reference.sparkSession
    import spark.implicits._
    // persisted: the corpus-sized word count feeds two actions (top-N
    // collect + mass totals) and must not recompute per action
    val counts = reference
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .persist()
    try {
      val kept = counts.filter(_._2 >= minCount)
        .orderBy(desc("n"), asc("w")).limit(maxVocab).collect().toMap
      val aggRow = counts.agg(sum("n"), count(lit(1))).head
      val totals = if (aggRow.isNullAt(0)) 0L else aggRow.getLong(0)
      require(totals > 0, "reference corpus has no tokens")
      val vocabTypes = aggRow.getLong(1)
      val keptMass = kept.values.sum
      val tailMass = totals - keptMass
      // the floored tail mass is split across its TYPES (plus one slot for
      // truly-unseen words) — a per-token constant equal to the whole tail
      // would let OOV gibberish outscore legitimate rare vocabulary
      val tailTypes = math.max(0L, vocabTypes - kept.size) + 1
      val denom = totals.toDouble + 1.0
      val log2 = math.log(2.0)
      UnigramLm(
        kept.map { case (w, n) => w -> math.log(n / denom) / log2 },
        math.log((tailMass + 1.0) / (denom * tailTypes)) / log2)
    } finally counts.unpersist()
  }

  /** `… + bits_per_token: double` (NULL for empty/null docs). */
  def score(df: DataFrame, textCol: String, lm: UnigramLm): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields :+
      StructField("bits_per_token", DoubleType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = lm.bitsPerToken(r.getString(idx)).map(Double.box).orNull
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ b)
      }
    }(enc)
  }

  /** Keep documents under the cross-entropy ceiling (CCNet keeps the
    * low-perplexity head/middle of the distribution).
    */
  def filterByPerplexity(df: DataFrame, textCol: String, lm: UnigramLm,
                         maxBitsPerToken: Double): DataFrame =
    score(df, textCol, lm)
      .filter(col("bits_per_token").isNotNull &&
        col("bits_per_token") <= maxBitsPerToken)

  /** Bigram-LM self-scoring, fully distributed (X49): train an add-one-
    * smoothed bigram model on the corpus and score every document by its
    * average negative log-likelihood under it — high NLL = improbable
    * token transitions = gibberish/boilerplate/wrong-language, the
    * KenLM-filter shape (CCNet) one order up from [[UnigramLm]].
    *
    * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)`; per-doc score
    * `nll = -Σ ln p / n_bigrams`, rounded to 4 decimals.
    *
    * Unlike [[train]]/[[score]] (driver-broadcast model map, right for a
    * floored vocabulary), the model here never materializes anywhere: the
    * count relations stay distributed and scoring is two equi-joins on
    * token keys — the right shape when the vocabulary itself is too big
    * to broadcast (no cap, no floor, exact). Returns `(idCol, n_bigrams,
    * nll_r)`; docs with <2 tokens have no transitions and drop out.
    *
    * Scale shape: the pair relation is corpus-token-sized but NARROW
    * (id, w1, w2) — text never rides any exchange; c12/c1 are vocab-
    * bounded wordcount aggregates (AQE broadcasts them when small); V
    * reduces to one broadcast row; the final per-doc agg is one narrow
    * shuffle on the id.
    */
  def bigramNll(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("_w"))
      .filter(col("_w").isNotNull)
    val pairs = toks.select(col(idCol), explode(zip_with(
        slice(col("_w"), lit(1), greatest(size(col("_w")) - 1, lit(0))),
        slice(col("_w"), lit(2), greatest(size(col("_w")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_p"))
      .select(col(idCol), col("_p.w1").as("_w1"), col("_p.w2").as("_w2"))
    val c12 = pairs.groupBy("_w1", "_w2").agg(count(lit(1)).as("_c12"))
    val c1 = pairs.groupBy("_w1").agg(count(lit(1)).as("_c1"))
    val v = toks.select(explode(col("_w")).as("_t"))
      .filter(length(col("_t")) > 0)
      .agg(countDistinct(col("_t")).as("_v"))
    // score the MODEL relation (vocab-bounded) once, then join the
    // corpus-sized pair relation against it exactly once — the pair rows
    // ride one scoring shuffle instead of two chained model joins, and
    // the (_w1,_w2) exchange feeding the c12 aggregate is the same
    // exchange the scoring join probes (AQE exchange reuse)
    val model = c12.join(c1, Seq("_w1"))
      .crossJoin(broadcast(v))
      .select(col("_w1"), col("_w2"),
        // exact expression shape shared with the DuckDB oracle:
        // ln((c12_d + 1.0) / (c1_d + V))
        log((col("_c12").cast("double") + 1.0) /
          (col("_c1").cast("double") + col("_v"))).as("_lp"))
    pairs
      .join(model, Seq("_w1", "_w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round((-sum(col("_lp"))) / count(lit(1)), 4).as("nll_r"))
  }
}
