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
    * Plan shape: corpus scan → explode → BroadcastHashJoin(LeftSemi) →
    * partial-aggregated distinct. No corpus shuffle.
    */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = benchmarkGrams(bench, textCol, n)
    corpus.select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
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
