package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: remove (or flag) training documents that
  * share any word n-gram with an evaluation/benchmark corpus — the
  * GPT-3/Pile-style 13-gram overlap scrub every serious pretraining
  * pipeline runs before training.
  *
  * Scale design (100 TB corpus, small benchmark): the benchmark's distinct
  * n-gram set is built once (it is eval-sized — MBs, not TBs) and
  * BROADCAST; the corpus side explodes each document's n-grams straight
  * into a broadcast LEFT SEMI hash join, so the corpus is never shuffled —
  * the only exchange carries the contaminated doc ids, which are rare by
  * construction. Membership is tested on the literal n-gram strings
  * (exact, no hash-collision caveat).
  *
  * The n-gram contract is [[TextFunctions.wordNgrams]]: tokens are
  * `split(lower(trim(text)), "\s+")`, grams joined with single spaces,
  * documents shorter than `n` tokens contribute none.
  */
object Decontaminate {

  /** Distinct n-grams of the benchmark corpus — one small aggregation. */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()

  /** Ids of corpus documents sharing at least one n-gram with `bench`.
    *
    * Two phases, both exact end-to-end:
    *  1. HASH PRE-FILTER — a fused kernel ([[graft.plans.expressions.NgramHashes]])
    *     emits 64-bit gram hashes with zero per-gram string allocation;
    *     candidates are docs with ≥1 hash hit against the broadcast
    *     benchmark hash set. Every truly contaminated doc survives this
    *     phase (same kernel both sides), plus rare hash-collision
    *     false positives.
    *  2. EXACT RESCORE — only the candidates (rare by construction)
    *     explode their literal gram strings against the broadcast
    *     benchmark gram set, eliminating collisions.
    *
    * Plan shape: two corpus scans, but gram STRINGS are built only for
    * candidates; no phase shuffles the corpus — both joins are broadcast
    * LEFT SEMI on the streamed side.
    */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, n: Int): DataFrame = {
    val hashes = graft.plans.expressions.ngramHashes(col(textCol), n)
    val benchHashes = bench.select(explode(hashes).as("h")).distinct()
    val candidates = corpus.select(col(idCol), explode(hashes).as("h"))
      .join(broadcast(benchHashes), Seq("h"), "left_semi")
      .select(col(idCol)).distinct()
    val grams = benchmarkGrams(bench, textCol, n)
    corpus.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(grams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The corpus with contaminated documents removed (left anti join on the
    * contaminated-id set — small side, broadcast by AQE).
    */
  def clean(corpus: DataFrame, bench: DataFrame,
            idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** Per-document contamination flag, for audit queries that want counts
    * rather than a filtered corpus.
    */
  def flagged(corpus: DataFrame, bench: DataFrame,
              idCol: String, textCol: String, n: Int): DataFrame = {
    val bad = contaminatedIds(corpus, bench, idCol, textCol, n)
      .withColumn("is_contaminated", lit(true))
    corpus.join(bad, Seq(idCol), "left_outer")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }
}
