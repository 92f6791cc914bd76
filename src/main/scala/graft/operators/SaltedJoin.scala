package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: when one join key carries a disproportionate
  * share of the left (fact) side, a plain hash join sends that whole key to
  * one reducer. Salting splits each hot key into `saltFactor` sub-keys:
  *
  *  - left rows get a RANDOM-but-deterministic salt in [0, saltFactor)
  *    (hash of a row-unique column, not rand() — reproducible runs);
  *  - right rows are REPLICATED once per salt value (explode), so every
  *    (key, salt) partition still finds its match.
  *
  * Cost: right side grows ×saltFactor — use on dimension-sized right sides
  * or after isolating the hot keys. AQE's skew-join handles moderate skew
  * automatically (spark.sql.adaptive.skewJoin); this operator is the
  * explicit tool for the extreme, known-hot-key case (e.g. the null/default
  * key of a 100 TB fact table).
  */
object SaltedJoin {

  private val SALT = "_salt"

  /** Inner equi-join of `left` and `right` on `keys`, salted `saltFactor`
    * ways. `leftSaltSource` must be a column expression that varies within
    * a key group (e.g. a row id) — it seeds the deterministic salt.
    */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            saltFactor: Int, leftSaltSource: Column): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn(SALT, pmod(xxhash64(leftSaltSource), lit(saltFactor)).cast("int"))
    val r = right.withColumn(SALT, explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ SALT).drop(SALT)
  }

  /** Skew profile of a key: top-n heaviest keys with their share — the
    * measurement half of the salting decision.
    */
  def skewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share", col("n_rows") / lit(total.toDouble))
      .orderBy(desc("n_rows"))
      .limit(topN)
  }
}
