package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.plans.expressions.bloomMightContain

/** Bloom-filter join pruning: build a bloom filter over the SMALL side's
  * join keys, and filter the BIG side with it BEFORE the shuffle. Rows
  * whose key cannot possibly match never enter the exchange — at 100 TB
  * this turns a full-fact-table shuffle into a shuffle of the matching
  * fraction (plus the fpp's worth of false positives, which the join
  * itself then removes — the result is always exact).
  *
  * Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
  * idea automatically, but only when the optimizer can SEE a selective
  * filter on the creation side. This operator is the explicit, library
  * form for when the small side is a computed relation (a dedup survivor
  * set, a sampled id list, an incremental-batch key set) whose
  * selectivity the optimizer cannot know.
  */
object BloomJoin {

  /** Bloom filter of `small`'s `keyCol` values (integral or string).
    * `expectedItems <= 0` counts the relation first (one cheap job on a
    * key-pruned scan) so the filter is sized to the real cardinality.
    */
  def keyBloom(small: DataFrame, keyCol: String, fpp: Double = 0.01,
               expectedItems: Long = 0L): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems
            else math.max(1L, small.select(keyCol).count())
    small.stat.bloomFilter(keyCol, n, fpp)
  }

  /** The pruning half on its own: `big` minus the rows whose `bigKey`
    * cannot be in `bf`. NULL keys are dropped (they match no inner join).
    */
  def pruneBig(big: DataFrame, bigKey: String, bf: BloomFilter): DataFrame =
    big.filter(bloomMightContain(col(bigKey), bf))

  /** Inner equi-join with the big side bloom-pruned before its shuffle.
    * Exact: the bloom has no false negatives, and its false positives are
    * eliminated by the join.
    */
  def inner(big: DataFrame, small: DataFrame, bigKey: String,
            smallKey: String, fpp: Double = 0.01,
            expectedItems: Long = 0L): DataFrame = {
    val bf = keyBloom(small, smallKey, fpp, expectedItems)
    val pruned = pruneBig(big, bigKey, bf)
    if (bigKey == smallKey) pruned.join(small, bigKey)
    else pruned.join(small, col(bigKey) === col(smallKey))
  }
}
