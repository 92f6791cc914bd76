package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and dataset splitting for
  * training-data pipelines. Both operators key on a STABLE hash of the id
  * — not `rand()` — so:
  *
  *  - membership is a pure function of the id: re-running the pipeline,
  *    adding executors, or reordering partitions never reshuffles a row
  *    between train and validation (the leakage-avoidance property);
  *  - the hash is the md5-derived 60-bit spec (first 15 hex chars), so
  *    split membership is reproducible OUTSIDE the engine in ANSI SQL —
  *    `CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT)` —
  *    and therefore oracle-checkable;
  *  - everything is a stateless single scan: no shuffle, no driver state,
  *    any table size.
  */
object Sampling {

  private val BUCKETS = 10000L

  /** Uniform bucket in [0, 10000) from the id's md5 (stable across runs,
    * engines, and languages).
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(BUCKETS))

  /** Adds `split` ∈ the given names, assigned by cumulative weight over the
    * id's hash bucket. Weights need not sum to 1 — the remainder falls into
    * the LAST split (so `("train", 0.9), ("val", 0.1)` and
    * `("train", 0.9), ("val", 1.0)` agree).
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).forall(w => w > 0 && w <= 1), "weights in (0,1]")
    val b = hashBucket(col(idCol))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cum.map(c => math.min(BUCKETS, math.round(c * BUCKETS)))
    val expr = splits.zip(thresholds).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), thr), acc) =>
      when(b < thr, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic `fraction` sample: keeps ids whose hash bucket falls
    * below the cutoff — the same rows survive on every run and engine.
    */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0,1]")
    df.filter(hashBucket(col(idCol)) < math.round(fraction * BUCKETS))
  }

  /** Weighted sampling WITHOUT replacement, fixed size k — the
    * Efraimidis–Spirakis A-ES scheme (public algorithm, IPL 2006): each
    * row draws u ∈ (0,1] and ranks by u^(1/w); the top-k by that key are
    * a weighted sample without replacement. Implemented with the
    * monotone-equivalent key `-ln(u)/w` (smaller = better), so the
    * selection is a global `ORDER BY key LIMIT k` — Spark executes that
    * as TakeOrderedAndProject (per-partition top-k heaps + driver merge
    * of k·numPartitions rows), NO global sort shuffle, which is the
    * 100 TB-safe shape.
    *
    * u is md5-derived from the id (u = (h+1)/2^52 with h the first 13
    * md5 hex chars), so the sample is deterministic across runs AND
    * reproducible in ANSI SQL for oracle checks. Rows with weight ≤ 0 or
    * NULL are excluded (zero-weight rows must never be sampled; they'd
    * otherwise rank by u alone).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     salt: String = "s42"): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("-" + salt))), 1, 13), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val key = -log(u) / weight.cast("double")
    df.filter(weight.isNotNull && (weight > lit(0)))
      .withColumn("_wkey", key)
      .orderBy(col("_wkey"), col(idCol))
      .limit(k)
      .drop("_wkey")
  }

  /** Stratified [[weightedSample]]: k rows per GROUP, weighted without
    * replacement within each group (A-ES per stratum) — per-language /
    * per-domain quota sampling with importance weights. The rank filter
    * plans as WindowGroupLimit (per-partition top-k heaps before the
    * shuffle), so the exchange carries at most k·groups·partitions rows.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weight: Column, kPerGroup: Int,
                             salt: String = "s42"): DataFrame = {
    require(kPerGroup > 0, "kPerGroup must be positive")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("-" + salt))), 1, 13), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0)
    val key = -log(u) / weight.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.filter(weight.isNotNull && (weight > lit(0)))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= kPerGroup)
      .drop("_rk")
  }

  /** Deterministic weighted interleave — the CURRICULUM/DATALOADER
    * ordering step: a global training order where group g's items appear
    * with density ∝ `rates(g)`, evenly spread rather than clumped (the
    * round-robin-with-weights schedule heterogeneous-mixture training
    * loops use). Item k (1-based rank within its group, ordered by id)
    * gets key k / rate — groups with rate 1.0 advance every step, rate
    * 0.5 every other step, etc. Adds `interleave_key`; consumers sort by
    * (interleave_key, groupCol, idCol) — a range-partitioned total sort
    * (scale-safe) for a full export, or TakeOrdered for a prefix. The
    * key is IEEE-division-deterministic, so the order is reproducible
    * across runs AND in ANSI SQL. Unknown/NULL groups get
    * `defaultRate`; rows with rate ≤ 0 are dropped (never scheduled).
    */
  def interleaveWeighted(df: DataFrame, groupCol: String, idCol: String,
                         rates: Map[String, Double],
                         defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(_ > 0), "rates must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.withColumn("_rate", rate)
      .filter(col("_rate") > 0.0)
      .withColumn("interleave_key",
        row_number().over(w).cast("double") / col("_rate"))
      .drop("_rate")
  }

  /** Deterministic mixture sampling: each group (source/domain) is kept at
    * its own rate — the data-mixing step that reweights a pretraining
    * corpus toward a target distribution (DoReMi-style static mixture).
    * Same id-pure membership as [[sampleByHash]]: rates can be tuned
    * between runs and the kept sets stay NESTED per group (a row kept at
    * 0.2 is still kept at 0.5), which makes mixture sweeps reproducible.
    * Stateless single scan — the rate lookup folds into one CASE chain.
    * A NULL group value matches no configured rate and takes
    * `defaultFraction`.
    */
  def sampleMixture(df: DataFrame, groupCol: String, idCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 1.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1) &&
      defaultFraction >= 0 && defaultFraction <= 1, "fractions in [0,1]")
    val cutoff = fractions.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultFraction * BUCKETS)): Column) {
      case ((g, f), acc) =>
        when(col(groupCol) === g, lit(math.round(f * BUCKETS))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < cutoff)
  }

  /** Temperature-sampled mixture (T5/mT5 style, X50): per-group keep
    * rates COMPUTED from the corpus itself instead of hand-configured
    * ([[sampleMixture]]'s contract). With group sizes n_g and temperature
    * exponent `alpha` ∈ (0,1], the target mixture is
    * `p_g = n_g^alpha / Σ_h n_h^alpha` (alpha < 1 upsamples small
    * groups/languages relative to their natural share), and each group is
    * kept at `rate_g = min(1, budgetRows · p_g / n_g)` via the same
    * id-pure hash buckets — so membership stays deterministic and NESTED
    * as the budget grows.
    *
    * Fully distributed: the rate relation is a per-group aggregate joined
    * back on the group key (AQE broadcasts it when small) — no driver
    * collect, so it holds when "groups" are millions of web domains, the
    * per-domain-cap shape (C4/RefinedWeb) at 100 TB.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         alpha: Double, budgetRows: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(budgetRows > 0, "budgetRows must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_pa", pow(col("_n").cast("double"), alpha))
    val tot = counts.agg(sum(col("_pa")).as("_tot"))
    // cutoff expression shape shared with the oracle SQL:
    // least(10000, round(budget * pa / tot / n * 10000))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(lit(BUCKETS.toDouble), round(
          lit(budgetRows.toDouble) * col("_pa") / col("_tot") /
            col("_n") * BUCKETS)).as("_cut"))
    df.join(rates, Seq(groupCol))
      .filter(hashBucket(col(idCol)) < col("_cut"))
      .drop("_cut")
  }

  /** Deterministic balanced sample: exactly `n` rows per group (fewer if
    * the group is smaller), chosen by the engine-stable md5 order — the
    * class-balancing step for fine-tuning / eval set construction. Same
    * determinism contract as [[splitByHash]]: a pure function of
    * (seed-free) ids, reproducible across runs, engines, and input order.
    * One hash exchange on the group key; per-group rank, no global sort.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     n: Int): DataFrame = {
    require(n > 0, "need n > 0")
    df.withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(md5(col(idCol).cast("string")), col(idCol))))
      .filter(col("_rank") <= n)
      .drop("_rank")
  }

  /** Deterministic global shuffle — the pre-training corpus permutation.
    * Adds `shard` (which of `numShards` output shards the row lands in)
    * and `pos` (its 0-based position within the shard), both pure
    * functions of (seed, id): re-running the job, changing parallelism, or
    * reordering the input never moves a row. The permutation key is
    * `md5(seed || ':' || id)` — engine-stable and therefore
    * oracle-reproducible in ANSI SQL.
    *
    * Scale shape: ONE hash exchange on `shard` (the shuffle is the point
    * of the operator), then each shard ranks independently — no global
    * sort, no single-partition window. With ids distinct, (key, id)
    * ordering is total, so `pos` is unambiguous even under md5 ties.
    */
  def shuffleDeterministic(df: DataFrame, idCol: String,
                           seed: Long, numShards: Int): DataFrame = {
    require(numShards > 0, "need at least one shard")
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val shard = pmod(conv(substring(key, 1, 15), 16, 10).cast("long"),
      lit(numShards.toLong))
    df.withColumn("shuffle_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("shuffle_key"), col(idCol))) - 1)
      .drop("shuffle_key") // derivable from (seed, id); never persist it
  }

  /** Deterministic contrastive pair mining (embedding-training prep):
    * each anchor is paired with a pseudo-random SAME-group neighbor
    * (positive) and a pseudo-random DIFFERENT-group neighbor (negative).
    * "Pseudo-random" = the md5 ordering keyed on (seed, id) — id-pure,
    * run/engine-stable, and reproducible in ANSI SQL (the oracle runs
    * the same walk).
    *
    *  - positives: within each group, the md5-ordered successor —
    *    `|group| - 1` pairs per group, one window shuffle keyed on the
    *    group (never quadratic);
    *  - negatives: rows land in `negBuckets` md5 buckets, each row pairs
    *    with its in-bucket successor when the groups differ — one
    *    bounded-partition window shuffle, NO global ordering (a global
    *    orderBy window would serialize the corpus through one partition).
    *    Rows whose successor shares their group emit no negative that
    *    round (~1/#groups of rows for balanced groups).
    *
    * Returns `(anchor, pair, kind)` with kind ∈ {pos, neg}.
    */
  def contrastivePairs(df: DataFrame, idCol: String, groupCol: String,
                       seed: Long = 42L, negBuckets: Int = 64): DataFrame = {
    require(negBuckets > 0, "need at least one negative bucket")
    val base = df.select(col(idCol).as("anchor"), col(groupCol).as("_grp"))
      .withColumn("_k",
        md5(concat_ws(":", lit(seed.toString), col("anchor").cast("string"))))
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_grp")).orderBy(col("_k"), col("anchor"))
    val pos = base
      .withColumn("pair", lead(col("anchor"), 1).over(wPos))
      .filter(col("pair").isNotNull)
      .select(col("anchor"), col("pair"), lit("pos").as("kind"))
    val wNeg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bkt")).orderBy(col("_k"), col("anchor"))
    val neg = base
      .withColumn("_bkt", pmod(conv(substring(col("_k"), 1, 15), 16, 10)
        .cast("long"), lit(negBuckets.toLong)))
      .withColumn("pair", lead(col("anchor"), 1).over(wNeg))
      .withColumn("_pgrp", lead(col("_grp"), 1).over(wNeg))
      .filter(col("pair").isNotNull && col("_pgrp") =!= col("_grp"))
      .select(col("anchor"), col("pair"), lit("neg").as("kind"))
    pos.unionByName(neg)
  }

  /** Leakage-safe train/validation split (X64): split membership is
    * decided per CONTENT GROUP, not per document, so exact duplicates
    * (same `md5(text)`) can never straddle the boundary — the train/test
    * contamination mode that doc-level [[splitByHash]] cannot rule out
    * when the corpus still contains dup clusters.
    *
    * Each group's representative is its MIN id; the whole group inherits
    * `splitByHash` of that representative, so the contract stays id-pure,
    * deterministic, and ANSI-reproducible (oracle q93). Adds `split` and
    * `grp` (the md5 content key, for auditing group integrity).
    *
    * Scale shape: the group relation is a narrow (md5, min-id) aggregate
    * — text itself never rides its shuffle — and the label join-back
    * recomputes md5 on the big side and hash-joins on it: ONE exchange
    * of the full rows, no sort, no driver state. (Near-dup-cluster
    * splits compose the same way from [[graft.operators.Dedup]]'s
    * cluster assignment instead of md5.)
    */
  def leakageSafeSplit(df: DataFrame, textCol: String, idCol: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    val grp = md5(col(textCol)).as("grp")
    val reps = df.select(grp, col(idCol).as("_id"))
      .groupBy(col("grp")).agg(min(col("_id")).as("_rep"))
    val labeled = splitByHash(reps, "_rep", splits).drop("_rep")
    df.withColumn("grp", md5(col(textCol))).join(labeled, "grp")
  }
}
