package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ 1) join by deletion neighborhoods — the
  * SymSpell blocking idea (public algorithm: Garbe's symmetric delete
  * spelling correction): two strings are within ONE edit (insert, delete,
  * or substitute) only if they share a key in {s} ∪ del1(s), where
  * del1(s) is every string obtained by deleting a single code point.
  *   - delete/insert: the shorter string IS a del1 of the longer;
  *   - substitute:    deleting the differing position from both sides
  *     yields the same string;
  * so the key join is candidate-COMPLETE for distance ≤ 1, and a final
  * `levenshtein ≤ 1` rescore removes the false candidates (e.g. "ab" vs
  * "ba" share del1 keys at distance 2). This is the record-linkage /
  * dirty-lookup primitive: match misspelled names against a dimension
  * without an all-pairs scan.
  *
  * Scale shape: each side explodes to (len+1) keys — corpus-linear, not
  * quadratic — and the only shuffle is the equi-join on the key; the
  * rescore is a per-row codegen'd `levenshtein` with the built-in
  * threshold early-exit. Duplicate (left, right) candidates from multiple
  * shared keys collapse with a pair-keyed `distinct` BEFORE the rescore.
  * Hot keys (huge clusters of near-identical strings) are bounded by
  * `maxBucket`: key buckets larger than that on either side are DROPPED
  * (the [[Graphs.coOccurrenceEdges]] degenerate-group contract — at
  * 100 TB one degenerate cluster must not emit a quadratic bucket
  * product; lost pairs are a documented cap, not a silent hang).
  */
object FuzzyText {

  /** All (left_id, right_id, dist ≤ 1) matches between `left(id, s)` and
    * `right(id, s)` (column names given by the callers). Null/empty
    * strings never match anything.
    */
  def editJoin1(left: DataFrame, leftId: String, leftStr: String,
                right: DataFrame, rightId: String, rightStr: String,
                maxBucket: Int = 1000000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket=$maxBucket out of range")
    def keyed(df: DataFrame, id: String, str: String, side: String) = {
      val base = df.select(col(id).as(s"${side}_id"), col(str).as(s"${side}_s"))
        .filter(col(s"${side}_s").isNotNull && length(col(s"${side}_s")) > 0)
      // {s} ∪ del1(s): the identity key plus one deletion per position.
      // Code-point deletions via substring surgery on a positions array —
      // native functions only, stays in codegen.
      base.select(col(s"${side}_id"), col(s"${side}_s"),
        explode(array_union(
          array(col(s"${side}_s")),
          transform(sequence(lit(1), length(col(s"${side}_s"))),
            i => concat(substring(col(s"${side}_s"), lit(1), i - 1),
              substring(col(s"${side}_s"), i + 1,
                length(col(s"${side}_s"))))))).as("_key"))
    }
    def capped(df: DataFrame, side: String) = {
      val sizes = df.groupBy(col("_key"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucket)
      df.join(sizes.select(col("_key")), Seq("_key"), "left_semi")
    }
    val l = capped(keyed(left, leftId, leftStr, "l"), "l")
    val r = capped(keyed(right, rightId, rightStr, "r"), "r")
    l.join(r, "_key")
      .select(col("l_id"), col("l_s"), col("r_id"), col("r_s"))
      .distinct()
      .withColumn("dist", levenshtein(col("l_s"), col("r_s"), 1))
      // the threshold variant returns -1 when the distance exceeds it
      .filter(col("dist") >= 0)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** Jaro-Winkler similarity join — the record-linkage scorer for name /
    * title fields where [[editJoin1]]'s edit-distance-1 net is too
    * tight. Candidate generation is FIRST-CHARACTER + LENGTH-BAND
    * blocking (the documented recall contract: a pair whose first
    * characters differ, or whose lengths differ by more than
    * `lenBand`, is never scored — at `minSim` ≥ 0.85 such pairs are
    * rare by construction since JW weights the prefix); scoring is the
    * fused codegen'd [[graft.plans.expressions.JaroWinkler]] kernel,
    * no UDF. Output: `(l_id, r_id, sim)` with sim ≥ minSim, l_id
    * string < r_id string… callers pass distinct-keyed sides.
    *
    * Scale shape: ONE equi-join on the block key (first char) with the
    * length band and threshold applied inside the join — candidates
    * per block are (block size)², so pre-aggregate to a VOCABULARY
    * before joining (names/terms, not raw rows), exactly like the q185
    * usage; no all-pairs scan ever runs.
    */
  def jwJoin(left: DataFrame, leftId: String, leftStr: String,
             right: DataFrame, rightId: String, rightStr: String,
             minSim: Double, lenBand: Int = 4): DataFrame = {
    require(minSim > 0 && minSim <= 1, s"minSim=$minSim")
    val l = left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"))
      .filter(col("l_s").isNotNull && length(col("l_s")) > 0)
      .withColumn("_blk", substring(col("l_s"), 1, 1))
    val r = right.select(col(rightId).as("r_id"), col(rightStr).as("r_s"))
      .filter(col("r_s").isNotNull && length(col("r_s")) > 0)
      .withColumn("_blk", substring(col("r_s"), 1, 1))
    l.join(r, Seq("_blk"))
      .filter(abs(length(col("l_s")) - length(col("r_s"))) <= lenBand)
      .withColumn("sim",
        graft.plans.expressions.jaroWinkler(col("l_s"), col("r_s")))
      .filter(col("sim") >= minSim)
      .select(col("l_id"), col("r_id"), col("sim"))
  }
}
