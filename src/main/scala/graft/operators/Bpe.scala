package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: train a merge list on a corpus, encode text with
  * it — the real learned-subword tokenizer a training pipeline needs
  * (TextFunctions.approxBpeTokenCount is the scan-time heuristic; this is
  * the genuine article).
  *
  * Scale design (100 TB corpus):
  *  - ONE corpus scan builds the (word, freq) dictionary — the classic
  *    BPE-training reduction: all further work happens on the dict, whose
  *    size is the corpus's unique-word count, not its token count.
  *  - Each merge round is one aggregation over the DISTRIBUTED dict
  *    (explode adjacent pairs → weighted count → top-1); only the single
  *    winning pair is collected. The dict is re-derived with that merge
  *    applied via a map — no shuffle — and lineage is truncated with an
  *    eager localCheckpoint every round (the connected-components lesson:
  *    iterative plans otherwise grow until the driver chokes).
  *  - Encoding is a stateless per-row kernel with the merge list broadcast
  *    as a reference object; ranks resolve via a hash map, so cost is
  *    O(symbols · log merges) per word, no shuffle.
  *
  * Tokenization contract matches the engine's text surface:
  * words = `split(lower(trim(text)), "\s+")`; a word's initial symbols are
  * its characters plus a `</w>` end-of-word marker.
  */
object Bpe {

  val EOW = "</w>"

  /** A trained vocabulary: merges in application order. */
  final case class Vocab(merges: Seq[(String, String)]) {
    /** rank map for the encoder: pair → priority (lower merges first) */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  private def wordSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EOW

  /** Train `numMerges` merges on the corpus. Deterministic: ties on pair
    * frequency break lexicographically, so the same corpus always yields
    * the same vocabulary (engine-stable, like every operator here).
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int): Vocab = {
    require(numMerges >= 0 && numMerges <= 10000, "numMerges in [0, 10000]")
    val spark = corpus.sparkSession
    import spark.implicits._

    // one corpus scan: word-frequency dict, each word pre-split to symbols
    var dict: org.apache.spark.sql.Dataset[(Seq[String], Long)] = corpus
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (wordSymbols(w): Seq[String], f) }
      .localCheckpoint(true)

    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the dict (small), top-1 to driver
      val top = dict.flatMap { case (syms, f) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p, f))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, n) => (n, p._1, p._2) }
        .orderBy(desc("_1"), asc("_2"), asc("_3"))
        .limit(1).collect()
      if (top.isEmpty || top(0)._1 < 2) exhausted = true
      else {
        val (_, a, b) = top(0)
        merges += ((a, b))
        val merged = a + b
        val prev = dict
        dict = prev.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(): Seq[String], f)
        }.localCheckpoint(true)
      }
      round += 1
    }
    Vocab(merges.result())
  }

  /** Encode one word with the trained ranks (greedy lowest-rank-first —
    * the canonical BPE apply loop).
    */
  private[operators] def encodeWord(w: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(w)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** `… + tokens: array<string>` — the corpus encoded with the vocab.
    * Partition-local map; the ranks travel in the closure (broadcast by
    * Spark's task serialization — vocab is KBs).
    */
  def encode(df: DataFrame, textCol: String, vocab: Vocab): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields :+
      StructField("tokens", ArrayType(StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val ranks = vocab.ranks
    df.mapPartitions { rows =>
      rows.map { r =>
        val text = r.getString(idx)
        val toks: Seq[String] =
          if (text == null) null
          else text.trim.toLowerCase.split("\\s+").toSeq
            .filter(_.nonEmpty).flatMap(w => encodeWord(w, ranks))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ toks)
      }
    }(enc)
  }

  /** Learned-vocab token count per document (the number a data-budget
    * calculation actually needs).
    */
  def tokenCount(df: DataFrame, textCol: String, vocab: Vocab): DataFrame =
    encode(df, textCol, vocab)
      .withColumn("n_bpe_tokens", size(col("tokens")))
      .drop("tokens")
}
