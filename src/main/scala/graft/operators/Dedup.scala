package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.expressions.{minhashSig, minhashText, normalizedText, sigAgreement, simhash64, spanScrubCol}

/** Document deduplication for training-data pipelines, at three fidelities:
  *
  *  - exact: normalized-content fingerprint groupBy (one shuffle);
  *  - MinHash + LSH banding: near-dup candidate pairs without the O(n²)
  *    cross join — shingle → k-wise minhash signature → band buckets →
  *    self-join only within buckets → exact Jaccard confirm;
  *  - SimHash: 64-bit fingerprint, near-dups = small Hamming distance,
  *    bucketed by 16-bit chunks (any pair within distance d ≤ 3 shares at
  *    least one of 4 chunks — pigeonhole).
  *
  * All shuffles key on the bucket/fingerprint, so at 100 TB each stage is
  * an ordinary hash-partitioned exchange; nothing collects to the driver.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The near-dup pipelines key their joins on `idCol` cast to long; a
    * non-integral id would cast to NULL and silently disable dedup, so
    * fail loudly instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    // resolve the field the way column references resolve (case-insensitive
    // under the default caseSensitive=false), not via the exact-match
    // schema(name) lookup — "DOC_ID" for column "doc_id" must hit the
    // type check below, not a Field-does-not-exist error
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val field = df.schema.find(f => resolver(f.name, idCol)).getOrElse(
      throw new IllegalArgumentException(
        s"$op: no column $idCol in [${df.columns.mkString(", ")}]"))
    field.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"$op needs an integral id column, but $idCol is $other; derive a " +
          s"surrogate first, e.g. .withColumn(\"_id\", xxhash64(col(\"$idCol\")))")
    }
  }

  /** Normalized word shingles of size k (distinct, order-insensitive
    * set). r9: a fused codegen kernel — output byte-identical (incl.
    * first-occurrence order) to the declarative formulation
    * `array_distinct(when(size(toks) < k, array(concat_ws(" ", toks)))
    * .otherwise(transform(sequence(1, size-(k-1)), i => concat_ws(" ",
    * slice(toks, i, k)))))` over `toks = split(lower(trim(text)),
    * "\s+")`, which churned intermediate arrays per row and dominated
    * the exact-rescore dedup family's runtime (DedupSpec pins the
    * equivalence property-style).
    */
  def shingles(text: Column, k: Int): Column =
    graft.plans.expressions.shingleSet(text, k)

  /** k-wise MinHash signature of a shingle set — a single-pass custom
    * expression (each shingle string-hashed once, k derived mixes), not
    * k × array_min(transform(...)) which re-hashes every shingle k times.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    minhashSig(sh, numHashes)

  /** Exact Jaccard between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** 128-bit content key over normalized text: md5 of the exact string
    * [[rollingFingerprint]] hashes. The 64-bit fingerprint birthday-bounds
    * at ~2^32 docs — a collision there would silently merge two DISTINCT
    * documents and drop a non-duplicate, so every EXACT-equality path
    * (exact dedup, the minhash pre-passes) keys on this instead; the
    * 64-bit fingerprint remains for estimation-grade uses.
    */
  private def contentKey(textCol: String): Column =
    md5(normalizedText(col(textCol)).cast("binary"))

  /** Exact dedup: keep the smallest id per normalized content key. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("_ck", contentKey(textCol))
      .groupBy(col("_ck"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_ck")

  /** All (a, b) member pairs within each capped bucket, via ONE shuffle:
    * window-cap the bucket membership (hot-bucket guard), collect the
    * capped members per bucket (bounded array, ≤ cap structs), and expand
    * the pairs with a nested `transform` — so the signature relation is
    * scanned ONCE and shuffled ONCE, instead of the classic self-join's
    * two scans + two shuffle sides. The groupBy after the window reuses
    * the window's hash partitioning on the same keys (no second exchange).
    *
    * The cap bounds the worst case: a degenerate corpus that lands n docs
    * in one bucket (mass-duplicated text — the normal case at 100 TB)
    * otherwise produces n² pairs on a single reducer. Members are kept in
    * ascending id order, so the survivors of a capped bucket still chain
    * to the smallest id; run [[exact]] first (see [[minhashDedup]]) so
    * identical docs never reach LSH at all.
    */
  private def cappedBucketPairs(banded: DataFrame, keyCols: Seq[String],
                                cap: Int, score: (Column, Column) => Column,
                                scoreName: String): DataFrame = {
    val keys = keyCols.map(col)
    val member = struct(col("id"), col("payload"))
    val capped = banded
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("id"))))
      .filter(col("_rn") <= cap)
    val buckets = capped
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(member)).as("ms"))
      .filter(size(col("ms")) > 1)
    val ms = col("ms")
    val pairsCol = flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + lit(2), size(ms)), y =>
        struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
          score(x.getField("payload"), y.getField("payload")).as(scoreName)))))
    buckets.select(explode(pairsCol).as("p")).select(col("p.*"))
  }

  /** DISTINCT (id_a, id_b) co-bucket pairs — the id-only variant of
    * [[cappedBucketPairs]] for pipelines that rescore candidates exactly
    * afterwards: no signature payload shuffles with the bucket rows and no
    * per-pair estimate is computed (a pair colliding in many bands costs
    * one long-pair per band, deduplicated by the distinct).
    */
  /** All distinct id pairs within each bucket of an (id, keys…) relation —
    * the quadratic core both the capped and the subdivided candidate
    * generators share. Caller bounds bucket sizes.
    */
  private def allPairsInBuckets(banded: DataFrame,
                                keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val buckets = banded
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(col("id"))).as("ms"))
      .filter(size(col("ms")) > 1)
    val ms = col("ms")
    val pairsCol = flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + lit(2), size(ms)), y =>
        struct(x.as("id_a"), y.as("id_b")))))
    buckets.select(explode(pairsCol).as("p")).select(col("p.*"))
  }

  /** Candidate id pairs with HOT-BUCKET SUBDIVISION instead of cap-drop —
    * the fix for the failure mode the 5M-doc stress run surfaced: a corpus
    * whose GENUINE near-dup clusters (which the exact pre-pass cannot
    * collapse — the texts differ) are larger than `cap` puts those docs
    * past the cap in EVERY band, and the capped generator silently never
    * proposes them.
    *
    * Shape: buckets ≤ cap take the normal all-pairs path. An OVERSIZED
    * (…, band, bucket) re-keys its members by the NEXT band's signature
    * slice (members of one true near-dup group agree on any other band
    * slice with prob ≈ J², so a group lands together in a sub-bucket with
    * 32 independent chances across bands, while unrelated hot-bucket
    * cohabitants separate); sub-buckets ≤ cap again take all-pairs, and
    * residue past the cap STAR-LINKS to its sub-bucket's min id instead
    * of dropping (a sub-bucket that oversized is one mass-near-dup group
    * agreeing on 2×`rowsPerBand` signature components — the min is a true
    * near-dup of the members, so the exact rescore keeps the star edges
    * and connected components glues the group). Pair volume stays
    * O(cap²/2 + size) per bucket — never quadratic in a hot bucket.
    *
    * SKEW CONTRACT (pinned by PlanSpec): no task ever buffers an
    * unbounded bucket. Bucket sizes come from a `groupBy(keys).count()`
    * pre-aggregate (map-side partial agg whose output is buckets-sized;
    * AQE broadcasts the typically-tiny hot-key set back, so the small
    * path's anti-join never shuffles the corpus) — NOT from
    * `count().over(Window.partitionBy(keys))`, which would ship a hot
    * bucket's entire population to a single reducer before subdividing
    * it. The sub-bucket top-`cap` selection is a pure rank-limit
    * (`row_number <= cap` with no other window consumer), which Catalyst
    * plans as a map-side WindowGroupLimit: each mapper ships at most
    * `cap` rows per sub-bucket into the exchange. Residue membership is
    * detected by joining back a one-row-per-sub-bucket (count, min)
    * aggregate — the join streams, nothing sorts or collects a whole
    * sub-bucket.
    */
  private[operators] def subdividedBucketIdPairs(banded: DataFrame,
      keyCols: Seq[String], sigCol: String, bands: Int, rowsPerBand: Int,
      cap: Int, probeHot: Boolean = false): DataFrame = {
    val keys = keyCols.map(col)
    val hotKeys = banded.groupBy(keys: _*).count()
      .filter(col("count") > cap).drop("count")
    // probeHot (EAGER callers only — it runs a bounded job): when NO
    // bucket exceeds the cap — the measured common case once the exact
    // pre-pass has collapsed mass duplicates — the subdivision machinery
    // (anti/semi joins, rank-limit window, residue stats, 3-way union) is
    // ~1 s of fixed plan overhead per call for provably-empty branches.
    // The probe is one limit-1 job over the buckets-sized pre-aggregate;
    // callers whose banded input derives from a persisted relation pay a
    // cheap re-scan. Lazy front ends keep probeHot=false so their plan
    // shape (and its PlanSpec skew pins) stays static.
    if (probeHot && hotKeys.isEmpty)
      // same semantics as the subdivided path below: self-pairs (possible
      // when a caller bands duplicate (id, keys) rows) are filtered out
      return allPairsInBuckets(banded.select(col("id") +: keys: _*), keyCols)
        .filter(col("id_a") =!= col("id_b"))
        .distinct()
    val small = banded.join(hotKeys, keyCols, "left_anti")
      .select(col("id") +: keys: _*)
    val smallPairs = allPairsInBuckets(small, keyCols)
    // oversized: sub-bucket on the next band's slice
    val hot = banded.join(hotKeys, keyCols, "left_semi")
      .withColumn("_b2", xxhash64(col("bucket"),
        slice(col(sigCol), ((col("band") + 1) % bands) * rowsPerBand + 1,
          lit(rowsPerBand))))
    val subKeys = keyCols :+ "_b2"
    // top-cap per sub-bucket: rank-limit only → map-side WindowGroupLimit
    val w2 = Window.partitionBy(subKeys.map(col): _*).orderBy(col("id"))
    val subTop = hot
      .withColumn("_rn", row_number().over(w2))
      .filter(col("_rn") <= cap)
      .select(col("id") +: subKeys.map(col): _*)
    val subPairs = allPairsInBuckets(subTop, subKeys)
    // residue: every member of a still-oversized sub-bucket star-links to
    // the sub-bucket min (rank 1, so its pairs with the top-cap rows are
    // already in subPairs; the final distinct absorbs the overlap)
    val subStats = hot.groupBy(subKeys.map(col): _*)
      .agg(min(col("id")).as("_min"), count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > cap)
      .select(subKeys.map(col) :+ col("_min"): _*)
    val starPairs = hot.join(subStats, subKeys)
      .select(least(col("_min"), col("id")).as("id_a"),
        greatest(col("_min"), col("id")).as("id_b"))
    smallPairs.unionByName(subPairs).unionByName(starPairs)
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
  }

  /** One 64-bit bucket key per band: xxhash64 over (band index, the band's
    * signature slice) — the band index is hashed in so identical component
    * values in different bands cannot collide into one bucket. ONE hash
    * expression over an exploded band sequence, not `bands` separate
    * hash calls materialized into an array: the generated code is a small
    * constant independent of the band count (cold-start codegen time was a
    * measured, dominant cost of the LSH queries at bench scale).
    */
  private[operators] def bandBucket(sig: Column, band: Column, rows: Int): Column =
    xxhash64(band, slice(sig, band * rows + 1, lit(rows)))

  /** (band, bucket) LSH keys for a precomputed signature relation
    * `(id, sig)` — shared by the estimate and exact-rescore pipelines.
    */
  private def bandedBuckets(withSig: DataFrame, bands: Int, rows: Int): DataFrame =
    withSig
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        bandBucket(col("sig"), col("band"), rows).as("bucket"))

  /** [[bandedBuckets]] keeping the signature column — the subdivided
    * candidate generator needs it to re-key oversized buckets.
    */
  private def bandedBucketsSig(withSig: DataFrame, bands: Int, rows: Int): DataFrame =
    withSig
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        bandBucket(col("sig"), col("band"), rows).as("bucket"))

  /** [[minhashCandidatePairs]] over a PRE-COMPUTED signature relation
    * `(id long, sig array<long>)` — for callers that already paid the
    * minhash pass (the incremental dedup index keeps signatures, so
    * re-tokenizing the text would run the batch's most expensive kernel
    * twice).
    */
  private[operators] def candidatePairsFromSigs(withSig: DataFrame,
      bands: Int, rowsPerBand: Int, maxBucketSize: Int): DataFrame =
    subdividedBucketIdPairs(bandedBucketsSig(withSig, bands, rowsPerBand),
      Seq("band", "bucket"), "sig", bands, rowsPerBand, maxBucketSize)

  /** Candidate near-dup id pairs from MinHash banding alone (no Jaccard
    * estimate): the cheap front end of an LSH → exact-rescore pipeline.
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, numHashes: Int = 64,
                            bands: Int = 32, maxBucketSize: Int = 512): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(df, idCol, "minhashCandidatePairs")
    val withSig = df.select(
      col(idCol).cast("long").as("id"),
      minhashText(col(textCol), shingleSize, numHashes).as("sig"))
    candidatePairsFromSigs(withSig, bands, numHashes / bands, maxBucketSize)
  }

  /** MinHash-LSH near-duplicate pairs with estimated Jaccard ≥ threshold.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, deduplicated across
    * buckets. bands*rowsPerBand must equal numHashes.
    *
    * The confirm step uses the MinHash agreement estimate (matching
    * signature components / k) so only the k-long signature shuffles —
    * never the shingle sets. Exact Jaccard rescoring, when needed, is a
    * join of the surviving pairs back to the text ([[ngramJaccardPairs]]
    * logic on a bounded candidate set).
    *
    * `maxBucketSize` caps candidates per (band, bucket) — see
    * [[cappedBucketPairs]]. Pairs beyond the cap in EVERY band are
    * dropped; with 16 bands a true near-dup pair is only lost if both
    * docs sit past the cap in all its matching bands, and the intended
    * guard against that is the [[exact]] pre-pass.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleSize: Int = 3, numHashes: Int = 64,
                   bands: Int = 16, threshold: Double = 0.7,
                   maxBucketSize: Int = 512): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(df, idCol, "minhashPairs")
    val rows = numHashes / bands

    // fused text→shingle→signature expression: one scan, no array<string>
    val withSig = df.select(
      col(idCol).as("id"),
      minhashText(col(textCol), shingleSize, numHashes).as("sig"))

    // explode into (band, bucketHash) — the LSH key; the signature rides
    // along as the pair-scoring payload
    val banded = withSig
      .select(col("id"), col("sig").as("payload"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", bandBucket(col("payload"), col("band"), rows))

    cappedBucketPairs(banded, Seq("band", "bucket"), maxBucketSize,
      (a, b) => sigAgreement(a, b), "jaccard")
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  /** Temporally-blocked [[minhashPairs]]: near-dup candidates only
    * between documents whose `windowCol` values differ by ≤ 1 — the
    * standard BLOCKING trick for rolling corpora (a crawl snapshot
    * dedups against itself and its neighbors, never against last
    * year's). Each doc is banded into its own window and the next, so
    * every |Δw| ≤ 1 pair still shares a bucket (w==w′ meet in both
    * windows, w′ = w+1 meet in w+1) while |Δw| ≥ 2 pairs are never even
    * CANDIDATES — candidate volume drops from corpus² to
    * Σ_w (|w| + |w+1|)², which is what keeps an ever-growing corpus's
    * dedup cost per snapshot constant.
    *
    * Pair semantics are exactly [[minhashPairs]] restricted to
    * |Δw| ≤ 1 (DedupSpec pins the equivalence).
    */
  def minhashPairsWindowed(df: DataFrame, textCol: String, idCol: String,
                           windowCol: String,
                           shingleSize: Int = 3, numHashes: Int = 64,
                           bands: Int = 16, threshold: Double = 0.7,
                           maxBucketSize: Int = 512): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(df, idCol, "minhashPairsWindowed")
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      col(windowCol).cast("long").as("w"),
      minhashText(col(textCol), shingleSize, numHashes).as("sig"))
    // band into (own window, next window); pairs surface wherever the
    // two docs' banded windows coincide
    val banded = withSig
      .select(col("id"), col("sig").as("payload"),
        explode(array(col("w"), col("w") + 1L)).as("wb"))
      .select(col("id"), col("payload"), col("wb"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", bandBucket(col("payload"), col("band"), rows))
    if (threshold <= 0.0) {
      // candidates-only mode (exact-rescore front end): distinct id
      // pairs, no per-pair signature scoring — the double-banding means
      // a pair can collide in up to 2×bands buckets, and deduping the
      // bare ids BEFORE any downstream join is ~3× cheaper than scoring
      // every collision (measured on the q114 shape). Hot buckets
      // subdivide instead of dropping (see [[subdividedBucketIdPairs]]).
      subdividedBucketIdPairs(banded.withColumnRenamed("payload", "sig"),
        Seq("wb", "band", "bucket"), "sig", bands, rows, maxBucketSize)
        .withColumn("jaccard", lit(0.0))
    } else
      cappedBucketPairs(banded, Seq("wb", "band", "bucket"), maxBucketSize,
        (a, b) => sigAgreement(a, b), "jaccard")
        .filter(col("jaccard") >= threshold)
        .groupBy(col("id_a"), col("id_b"))
        .agg(max(col("jaccard")).as("jaccard"))
  }

  /** EXACT temporally-blocked near-dup pairs: [[minhashPairsWindowed]]
    * candidates rescored with true shingle Jaccard — all |Δw| ≤ 1 pairs
    * at `jaccard >= threshold`, exactly (the LSH front end only prunes,
    * never decides). Same persist/semi-join economics as
    * [[minhashDedupExact]]: the SIGNATURE relation (id, w, sig — never
    * the text; ~0.5 KB/doc instead of the corpus payload, so the cache
    * fits in memory even in a block manager already crowded by other
    * work) is computed once and cached, the four candidate-generation
    * branches re-derive banding from it, and shingle sets are built only
    * for docs that appear in a candidate pair — re-read from the
    * column-pruned source scan, each shingled once. That second scan
    * assumes `df` is IMMUTABLE for the duration of the call (a snapshot
    * read — the norm for a versioned table or a parquet dir): a source
    * mutating between the signature pass and the rescore pass could
    * prune pairs on stale signatures. Re-read through a pinned version
    * if the input is a live table. EAGER: the bounded
    * pair set is materialized so every intermediate cache is released
    * before returning — localCheckpoint blocks in local mode, a durable
    * parquet scratch write when `scratchDir` is set (the cluster path).
    */
  def minhashPairsWindowedExact(df: DataFrame, textCol: String, idCol: String,
                                windowCol: String,
                                shingleSize: Int = 3, numHashes: Int = 64,
                                bands: Int = 16, threshold: Double = 0.7,
                                maxBucketSize: Int = 512,
                                scratchDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(df, idCol, "minhashPairsWindowedExact")
    val rows = numHashes / bands
    val sigs = df.select(
      col(idCol).cast("long").as("id"),
      col(windowCol).cast("long").as("w"),
      minhashText(col(textCol), shingleSize, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs
      .select(col("id"), col("sig"),
        explode(array(col("w"), col("w") + 1L)).as("wb"))
      .select(col("id"), col("sig"), col("wb"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", bandBucket(col("sig"), col("band"), rows))
    val cand = subdividedBucketIdPairs(banded,
      Seq("wb", "band", "bucket"), "sig", bands, rows, maxBucketSize,
      probeHot = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try
      materializeEager(
        exactRescorePairs(cand,
          df.select(col(idCol).cast("long").as("id"), col(textCol)), textCol,
          shingleSize, threshold),
        scratchDir)
    finally {
      cand.unpersist(blocking = false)
      sigs.unpersist(blocking = false)
    }
  }

  /** Eagerly materialize an operator result so every upstream cache can
    * be released before returning. Local mode (`scratchDir = None`):
    * eager `localCheckpoint` — result blocks live in the session's block
    * manager and die with it. Cluster path: write the result to a
    * parquet scratch directory and hand back a scan of it — durable
    * across executor loss and exactly the "intermediate table"
    * substitute the localCheckpoint contract calls for.
    */
  private[operators] def materializeEager(df: DataFrame,
      scratchDir: Option[String]): DataFrame = scratchDir match {
    case Some(dir) =>
      val p = dir.stripSuffix("/") + "/mat_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      df.write.mode("errorifexists").parquet(p)
      df.sparkSession.read.parquet(p)
    case None => df.localCheckpoint(true)
  }

  /** Exact-Jaccard rescore of an LSH candidate id-pair set — the shared
    * back end of [[minhashDedupExact]] and [[minhashPairsWindowedExact]].
    * Shingle sets are built ONLY for docs that appear in a candidate pair
    * (semi-join first) and each such doc is shingled once however many
    * pairs it joins; output `(id_a, id_b, jaccard)` keeps pairs at or
    * above `threshold`. `docs` must expose (`id`, `textCol`).
    */
  private def exactRescorePairs(cand: DataFrame, docs: DataFrame,
      textCol: String, shingleSize: Int, threshold: Double): DataFrame = {
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("_id")).distinct()
    val sh = docs.select(col("id").as("_id"), col(textCol))
      .join(candIds, Seq("_id"), "left_semi")
      .select(col("_id"), shingles(col(textCol), shingleSize).as("_sh"))
    cand
      .join(sh.select(col("_id").as("id_a"), col("_sh").as("sh_a")), "id_a")
      .join(sh.select(col("_id").as("id_b"), col("_sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cross-relation near-duplicate JOIN (record linkage / fuzzy join):
    * LSH-bucket BOTH relations with the same banding and equi-join on
    * (band, bucket) — candidate pairs between two different corpora
    * without the |L|×|R| cross join (the entity-resolution shape:
    * incoming batch vs reference corpus, two crawl snapshots, …).
    *
    * Output `(id_l, id_r, jaccard)` where jaccard is the signature
    * AGREEMENT estimate; rescore exactly on the candidate set when the
    * threshold must be sharp (join back to [[shingles]] + [[jaccard]],
    * the q23 pattern). Per-side bucket caps bound hot buckets; run
    * [[exact]]-style dedup per side first for mass-duplicated corpora.
    *
    * Scale shape: each side shuffles once on its bucket keys (signature
    * payload only — shingles never move), the join is an ordinary hash
    * join on (band, bucket), and estimates dedup with one groupBy.
    *
    * Exactness caveat (same as [[minhashDedupExact]]): the per-side
    * bucket cap drops copies past `maxBucketSize` in a bucket — with
    * mass-duplicated text, collapse each side with [[exact]] first.
    */
  def minhashJoin(left: DataFrame, leftText: String, leftId: String,
                  right: DataFrame, rightText: String, rightId: String,
                  shingleSize: Int = 3, numHashes: Int = 64,
                  bands: Int = 16, threshold: Double = 0.7,
                  maxBucketSize: Int = 512): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(left, leftId, "minhashJoin")
    requireIntegralId(right, rightId, "minhashJoin")
    val rows = numHashes / bands
    def bucketSide(df: DataFrame, textCol: String, idCol: String,
                   idName: String, sigName: String): DataFrame =
      df.select(col(idCol).cast("long").as(idName),
          minhashText(col(textCol), shingleSize, numHashes).as(sigName))
        .select(col(idName), col(sigName),
          explode(sequence(lit(0), lit(bands - 1))).as("band"))
        .withColumn("bucket", bandBucket(col(sigName), col("band"), rows))
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("band"), col("bucket")).orderBy(col(idName))))
        .filter(col("_rn") <= maxBucketSize)
        .drop("_rn")
    val l = bucketSide(left, leftText, leftId, "id_l", "sig_l")
    val r = bucketSide(right, rightText, rightId, "id_r", "sig_r")
    l.join(r, Seq("band", "bucket"))
      .select(col("id_l"), col("id_r"),
        sigAgreement(col("sig_l"), col("sig_r")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_l"), col("id_r"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  /** [[minhashJoin]] in candidates-only form (the exact-rescore front
    * end): distinct `(id_l, id_r)` banded collisions, no estimate — the
    * signature is dropped right after bucketing, so only (id, band,
    * bucket) rows ride the join.
    */
  def minhashJoinCandidates(left: DataFrame, leftText: String,
                            leftId: String, right: DataFrame,
                            rightText: String, rightId: String,
                            shingleSize: Int = 3, numHashes: Int = 64,
                            bands: Int = 32,
                            maxBucketSize: Int = 512): DataFrame =
    minhashJoin(left, leftText, leftId, right, rightText, rightId,
      shingleSize, numHashes, bands, threshold = 0.0, maxBucketSize)
      .select(col("id_l"), col("id_r"))

  /** Connected components over a pair graph by iterative min-label
    * propagation: each node adopts the smallest label among itself and its
    * neighbors until fixpoint. Converges in O(component diameter)
    * iterations — near-dup components are shallow in practice, and each
    * iteration is one shuffle-join, so the whole resolution is
    * cluster-parallel. Returns (id, component) with component = the
    * smallest id in the node's component.
    */
  /** Hybrid: a near-dup pair graph is usually MUCH smaller than the table
    * (it holds only candidate duplicates). Below `driverEdgeLimit` edges,
    * union-find on the driver resolves components in one collect — the
    * same bounded-driver-state trade as IVF's sampled centroids. Above it,
    * fall back to the distributed min-label-propagation loop.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 30,
                          driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    // the union-find path materializes up to driverEdgeLimit edges on the
    // driver; cap the cap so a caller can't quietly opt into a
    // driver-OOM-scale collect (the distributed path exists for that)
    require(driverEdgeLimit <= 10000000L,
      s"driverEdgeLimit=$driverEdgeLimit exceeds the 10M driver union-find " +
        "ceiling; larger edge sets must use the distributed min-label " +
        "propagation path (lower driverEdgeLimit instead of raising it)")
    requireIntegralId(pairs, "id_a", "connectedComponents")
    requireIntegralId(pairs, "id_b", "connectedComponents")
    // ids normalized to long up front so the union-find path never sees
    // int/short-typed id columns (getLong would ClassCastException)
    val cached = pairs
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .cache()
    val nEdges = cached.count()
    if (nEdges <= DriverPath.effective(driverEdgeLimit)) {
      val edges = cached.collect().map(r => (r.getLong(0), r.getLong(1)))
      cached.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keys.toSeq.map(id => (id, find(id)))
      import spark.implicits._
      return rows.toDF("id", "component")
    }
    // starComponents returns an eager localCheckpoint, so the input
    // cache can be dropped as soon as it does. Star contraction (not
    // min-label) is the distributed default: its round count is
    // O(log n) regardless of component diameter, while min-label needs
    // one shuffle round per hop of the longest chain — a 10k-link
    // duplicate chain (trivial at 100 TB) would mean 10k shuffle rounds.
    try starComponents(cached, maxIters)
    finally cached.unpersist(blocking = false)
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — public algorithm). Each round is two
    * window-grouped shuffles keyed on a node id; the edge set contracts
    * toward per-component stars centered at the component minimum in
    * O(log n) rounds INDEPENDENT of component diameter. Min-label
    * propagation ([[minLabelComponents]]) needs O(diameter) rounds — on
    * the chain graphs that long duplicate runs produce, that is the
    * difference between ~log₂(n) shuffles and n shuffles at 100 TB.
    *
    * Returns (id, component) with component = smallest id reachable.
    *
    *  - large-star: every node n > c in c's neighborhood re-attaches to
    *    m = min(N(c) ∪ {c}) — strictly-larger neighbors hop to the
    *    local minimum, halving long chains;
    *  - small-star: every node v ≤ c in c's canonical (smaller-side)
    *    neighborhood re-attaches to m = min(N≤(c) ∪ {c}) — flattening
    *    the contracted tree toward a star.
    *
    * Fixpoint = the edge multiset is unchanged by a full round (checked
    * with a count + order-insensitive xxhash64 checksum in ONE agg job);
    * at fixpoint every edge is (node → its component min).
    */
  def starComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // canonical simple undirected edges: u = greater endpoint, v = smaller;
    // self-loops dropped (they carry no connectivity)
    var edges = pairs.select(
        greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("u"),
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint(true)
    // count + order-insensitive XOR checksum (edges are distinct, so set
    // equality == multiset equality; XOR never overflows under ANSI
    // arithmetic, unlike SUM). Inside the loop the signature rides the
    // checkpoint job as an Observation — convergence detection costs no
    // extra pass.
    def sigOf(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    var sig = sigOf(
      edges.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head)
    if (sig._1 == 0) return Seq.empty[(Long, Long)].toDF("id", "component")
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // ---- large-star ----
      // neighborhoods over both directions; per center c the window min
      // gives m = min(N(c) ∪ {c}) (c itself enters via least(m, c))
      val nbrs = edges.select(col("u").as("c"), col("v").as("n"))
        .union(edges.select(col("v").as("c"), col("u").as("n")))
      val wc = Window.partitionBy(col("c"))
      val large = nbrs
        .withColumn("m", least(min(col("n")).over(wc), col("c")))
        .filter(col("n") > col("c"))
        // n > c ≥ m, so (n, m) is already in canonical (greater, smaller)
        // order; n = m is impossible
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
      // ---- small-star ----
      // canonical edges already point each center u at its smaller
      // neighbors; m = min over them (< u always). Emit (v, m) for each
      // smaller neighbor v ≠ m plus the center's own (u, m).
      val wu = Window.partitionBy(col("u"))
      val withM = large.withColumn("m", min(col("v")).over(wu))
      val obs = new org.apache.spark.sql.Observation()
      val small = withM
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .distinct()
        .observe(obs, count(lit(1)).as("cnt"),
          expr("bit_xor(xxhash64(u, v))").as("sig"))
        .localCheckpoint(true)
      val newSig = (obs.get("cnt").asInstanceOf[Long],
        Option(obs.get("sig")).map(_.asInstanceOf[Long]).getOrElse(0L))
      converged = newSig == sig
      sig = newSig
      edges = small
      i += 1
    }
    // fail LOUDLY: labels are documented correct only at fixpoint, and a
    // warning would let connectedComponents / the SQL procedure silently
    // persist wrong component assignments downstream
    if (!converged)
      throw new IllegalStateException(
        s"starComponents: contraction stopped at maxIters=$maxIters without " +
          "reaching a fixpoint — raise maxIters (components are correct only " +
          "at fixpoint)")
    // at fixpoint edges are stars (node → component min); the centers
    // themselves appear only on the v side — label them with themselves
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
    labels.union(
        edges.select(col("v").as("id")).except(edges.select(col("u").as("id")))
          .select(col("id"), col("id").as("component")))
      .localCheckpoint(true)
  }

  /** Connected components by iterative min-label propagation — each round
    * one join-shuffle, convergence in O(component diameter) rounds. Kept
    * as the reference implementation; [[starComponents]] (O(log n) rounds)
    * is the production distributed path.
    */
  def minLabelComponents(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().localCheckpoint(true)
    // Every iteration ends in an EAGER localCheckpoint, for two reasons:
    // (1) lineage truncation — cache() does NOT truncate the logical plan,
    //     so an iterative join loop otherwise builds a plan that grows with
    //     every iteration and kills the driver on analysis/explain long
    //     before data size matters (measured: a 40-iteration chain OOMed
    //     on plan strings alone);
    // (2) lifecycle — checkpoint blocks belong to the RDD and are freed by
    //     the ContextCleaner when the previous iteration's DataFrame goes
    //     out of scope; nothing accumulates in CacheManager.
    // The checkpoint action itself is the per-iteration job; the
    // Observation is read after it, tallying changed labels without a
    // second pass.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min(col("component")).as("_nbr_min"))
      val obs = new org.apache.spark.sql.Observation()
      labels = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("_nbr_min"), col("component")))
            .as("component"))
        .withColumn("_chg", (col("component") =!= col("_old")).cast("long"))
        .observe(obs, sum(col("_chg")).as("changed"))
        .drop("_old", "_chg")
        .localCheckpoint(true)
      converged = Option(obs.get("changed")).forall(_.asInstanceOf[Long] == 0L)
      i += 1
    }
    if (!converged)
      log.warn(
        s"connectedComponents: min-label propagation stopped at maxIters=$maxIters " +
          "without converging — components with diameter > maxIters are split; " +
          "raise maxIters for deep duplicate chains")
    labels
  }

  /** MinHash-LSH dedup: drop near-duplicates, keeping exactly the smallest
    * id of each CONNECTED near-dup component (true single-linkage: resolved
    * with connected components over the candidate-pair graph, so chains
    * like a~b, b~c collapse to one survivor even when a~c was never a
    * direct candidate pair).
    */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   shingleSize: Int = 3, numHashes: Int = 64,
                   bands: Int = 16, threshold: Double = 0.7,
                   maxBucketSize: Int = 512): DataFrame = {
    requireIntegralId(df, idCol, "minhashDedup")
    // Exact pre-pass (CCNet-style): identical texts collapse to their
    // min-id representative BEFORE LSH, in one fingerprint-keyed window.
    // This removes the degenerate hot-bucket input (mass-duplicated text,
    // the normal shape at 100 TB) so the per-bucket cap almost never
    // fires on real duplicates. Survivors are unchanged vs. pure LSH:
    // an exact group's members all share one signature, so they'd land in
    // one component whose minimum is exactly the representative we keep.
    val reps = df
      .withColumn("_rn", row_number().over(
        Window.partitionBy(contentKey(textCol))
          .orderBy(col(idCol))))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val pairs = minhashPairs(reps, textCol, idCol, shingleSize, numHashes,
      bands, threshold, maxBucketSize)
    val dupIds = connectedComponents(pairs)
      .filter(col("id") =!= col("component")) // non-minimum of its component
      .select(col("id").as("_dup_id"))
    reps.join(dupIds, col(idCol).cast("long") === col("_dup_id"), "left_anti")
  }

  /** MinHash-LSH dedup with EXACT Jaccard confirmation (the CCNet-grade
    * pipeline): LSH proposes candidate id pairs (banding only — no
    * estimate, see [[minhashCandidatePairs]]), then every candidate is
    * rescored with true shingle-set Jaccard before clustering — estimator
    * noise can neither drop nor add a pair. Defaults use 2-row bands
    * (32 bands × 2 rows), putting candidate recall at J ≥ 0.7 above
    * 1 − 5e-10, so the output equals the all-pairs exact-Jaccard
    * single-linkage dedup while the join stays bucket-bounded.
    *
    * EXACTNESS CONTRACT: equality with the all-pairs ground truth holds
    * while every (band, bucket) population stays ≤ `maxBucketSize`, and
    * — since r8 — degrades gracefully instead of silently past it: an
    * oversized bucket SUBDIVIDES on another band's signature slice and
    * its residue star-links to the sub-bucket min
    * ([[subdividedBucketIdPairs]]), so mass-near-duplicated corpora
    * (genuine >cap-sized near-dup clusters — the shape the 5M-doc stress
    * run surfaced, where the old cap-drop lost 11% of near-dup removals)
    * keep their groups connected. The exact pre-pass still collapses
    * identical texts first, so only DISTINCT near-identical docs count
    * toward a bucket.
    */
  def minhashDedupExact(df: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, numHashes: Int = 64,
                        bands: Int = 32, threshold: Double = 0.7,
                        maxBucketSize: Int = 512,
                        scratchDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireIntegralId(df, idCol, "minhashDedupExact")
    val id = col(idCol).cast("long")

    // EAGER operator: the rep relation feeds three plan branches
    // (candidates, rescore, output), so it is persisted and read three
    // times — and because a LAZY result would still reference that cache,
    // making deterministic release impossible (a WeakReference scheme was
    // tried; it leaked exactly when memory pressure mattered), the operator
    // instead materializes its RESULT via an eager localCheckpoint and
    // unpersists every intermediate before returning. The returned blocks
    // belong to the result's RDD and are freed by the ContextCleaner when
    // the caller drops it. At cluster scale pass `scratchDir` to write the
    // survivors to a durable parquet scratch instead ([[materializeEager]]);
    // MEMORY_AND_DISK blocks spill, they never OOM.
    //
    // Exact pre-pass (CCNet-style): one doc per distinct fingerprint (min
    // id) BEFORE LSH, so mass-duplicated text never reaches the buckets.
    // The signature is computed AFTER the rn=1 filter: duplicate texts are
    // never minhashed and signatures never ride the window shuffle.
    val reps = df
      .withColumn("_rn", row_number().over(
        Window.partitionBy(contentKey(textCol))
          .orderBy(col(idCol))))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn("_sig", minhashText(col(textCol), shingleSize, numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate pairs also feed three branches (id extraction + both rescore
    // sides); a bounded relation (≤ cap²/2 per bucket), tiny next to the
    // corpus
    val cand = subdividedBucketIdPairs(
      bandedBucketsSig(
        reps.select(id.as("id"), col("_sig").as("sig")),
        bands, numHashes / bands),
      Seq("band", "bucket"), "sig", bands, numHashes / bands, maxBucketSize,
      probeHot = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exactPairs = exactRescorePairs(cand,
        reps.select(id.as("id"), col(textCol)), textCol,
        shingleSize, threshold)
      val dupIds = connectedComponents(exactPairs)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("_dup_id"))
      materializeEager(
        reps.join(dupIds, id === col("_dup_id"), "left_anti").drop("_sig"),
        scratchDir)
    } finally {
      cand.unpersist(blocking = false)
      reps.unpersist(blocking = false)
    }
  }

  /** SimHash fingerprints with 4×16-bit band buckets for Hamming-≤3 pairs.
    * Same one-shuffle capped-bucket expansion as [[minhashPairs]].
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 512): DataFrame = {
    requireIntegralId(df, idCol, "simhashPairs")
    simhashPairsOn(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp")),
      maxHamming, maxBucketSize)
  }

  /** Hamming-≤d pairs over a precomputed 64-bit fingerprint relation
    * `(id, fp)`. The 4×16-bit pigeonhole makes the candidate set a strict
    * SUPERSET of all pairs within distance d ≤ 3, so after the exact
    * bit_count filter the result is exact — any fingerprint function
    * (the fast [[graft.plans.expressions.simhash64]] kernel, or an
    * SQL-reproducible one) plugs in.
    */
  def simhashPairsOn(withFp: DataFrame, maxHamming: Int = 3,
                     maxBucketSize: Int = 512): DataFrame = {
    val banded = withFp.select(col("id"), col("fp").as("payload"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band", "chunk")))
    cappedBucketPairs(banded, Seq("band", "chunk"), maxBucketSize,
      (a, b) => bit_count(a.bitwiseXOR(b)), "hamming")
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Paragraph-level exact dedup (RefinedWeb/CCNet-style): split each
    * document on `splitPattern`, drop every paragraph that already
    * occurred EARLIER in the corpus (first occurrence wins, ordered by
    * (id, position)), and reassemble the survivors in their original
    * order joined by `joinSep`. Documents whose every paragraph was
    * dropped are removed.
    *
    * Returns `(idCol, textCol, n_paras_kept, n_paras_dropped)` — callers
    * join back on `idCol` for their other columns, so the wide original
    * row never rides the paragraph shuffles.
    *
    * Scale shape: exactly TWO shuffles of paragraph-granularity rows —
    * the first-occurrence window partitions on md5(paragraph) (128-bit:
    * no collision merges at corpus scale, unlike a 64-bit key), the
    * reassembly groups by document id. No driver state, no skew beyond
    * the paragraph-frequency distribution itself (a mass-duplicated
    * paragraph lands in ONE window partition; its rows are dropped there
    * rather than joined, so the hot key costs a sort, not a blowup).
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
                     splitPattern: String = "\n{2,}",
                     joinSep: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), splitPattern))
        .as(Seq("_pos", "_para")))
      .filter(length(col("_para")) > 0)
    val ranked = paras.withColumn("_rn", row_number().over(
      Window.partitionBy(md5(col("_para").cast("binary")))
        .orderBy(col(idCol), col("_pos"))))
    // one doc-keyed groupBy reassembles AND counts: collect (pos, para,
    // kept) structs, sort by position, filter to survivors
    ranked
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col("_pos"), col("_para"), (col("_rn") === 1).as("_keep"))))
        .as("_sorted"))
      .select(
        col(idCol),
        array_join(expr(
          "transform(filter(_sorted, s -> s._keep), s -> s._para)"),
          joinSep).as(textCol),
        expr("size(filter(_sorted, s -> s._keep))").cast("long")
          .as("n_paras_kept"),
        expr("size(filter(_sorted, s -> NOT s._keep))").cast("long")
          .as("n_paras_dropped"))
      .filter(col("n_paras_kept") > 0)
  }

  /** Corpus-adaptive boilerplate-token removal (the CCNet/RefinedWeb
    * "frequent lines" filter at token granularity): drop every token whose
    * DOCUMENT frequency exceeds `maxDocFrac` of the corpus — navigation
    * chrome, licence banners, and corpus-ubiquitous stopwords that a
    * static list can't know — and reassemble each document's surviving
    * tokens in their original order. Complements [[paragraphDedup]]:
    * that removes content REPEATED verbatim across documents; this
    * removes content so COMMON it carries no training signal.
    *
    * Returns `(idCol, textCol, n_toks_kept, n_toks_dropped)`; documents
    * whose every token was boilerplate are removed (callers join back on
    * `idCol` for their other columns).
    *
    * Scale shape: two token-granularity shuffles — document frequency is
    * one groupBy on the token (map-side partial `countDistinct`), the
    * reassembly one doc-keyed groupBy — and the wide original row rides
    * neither. The frequent set is BOUNDED BY CONSTRUCTION (only tokens in
    * > maxDocFrac of all documents qualify — at 0.5 that is at most
    * 2/maxDocFrac × the mean document length, independent of corpus
    * size), so it broadcasts; the corpus never joins against itself.
    */
  def frequentTokenFilter(df: DataFrame, textCol: String, idCol: String,
                          maxDocFrac: Double = 0.5): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac < 1,
      s"maxDocFrac must be in (0, 1), got $maxDocFrac")
    // bounded 1-row aggregate: the corpus size that anchors the threshold
    val nDocs = df.select(col(idCol)).count()
    val toks = df
      .select(col(idCol), posexplode(split(lower(trim(col(textCol))), "\\s+"))
        .as(Seq("_pos", "_tok")))
      .filter(length(col("_tok")) > 0)
    val frequent = toks
      .groupBy(col("_tok"))
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") > lit(maxDocFrac) * lit(nDocs.toDouble))
      .select(col("_tok"), lit(true).as("_hot"))
    // The 2/maxDocFrac × mean-doc-length size bound only keeps the
    // frequent set broadcastable for moderate thresholds; tiny maxDocFrac
    // on a long-document corpus could exceed driver/broadcast limits. Only
    // force the hint when the bound is safely small; below that, leave the
    // choice to AQE, which broadcasts from the MEASURED size at runtime
    // and falls back to a shuffle join when it doesn't fit.
    val hinted = if (maxDocFrac >= 0.05) broadcast(frequent) else frequent
    toks.join(hinted, Seq("_tok"), "left")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col("_pos"), col("_tok"), coalesce(col("_hot"), lit(false)).as("_drop"))))
        .as("_sorted"))
      .select(
        col(idCol),
        array_join(expr(
          "transform(filter(_sorted, s -> NOT s._drop), s -> s._tok)"),
          " ").as(textCol),
        expr("size(filter(_sorted, s -> NOT s._drop))").cast("long")
          .as("n_toks_kept"),
        expr("size(filter(_sorted, s -> s._drop))").cast("long")
          .as("n_toks_dropped"))
      .filter(col("n_toks_kept") > 0)
  }

  /** Exact n-gram Jaccard pairs at `threshold`, WITHOUT the all-pairs
    * product: PPJoin-style prefix filtering (Chaudhuri et al., ICDE'06;
    * Xiao et al., WWW'08). Unlike MinHash banding this is lossless — if
    * `J(A,B) >= t` then `|A∩B| >= ⌈t·|A|⌉` (the union is at least as big
    * as either set), and under ANY total order two sets with overlap `o`
    * must collide within their first `|S| - o + 1` elements — so joining
    * only each document's rare-first prefix of length `|S| - ⌈t·|S|⌉ + 1`
    * on an EQUALITY key provably generates every qualifying pair, and the
    * exact Jaccard rescore then removes false positives. Same result as
    * the naive cross join, for any input and threshold.
    *
    * Scale shape: candidate generation is one equi-join of prefix shingles
    * (hash-partitioned on the shingle; no cartesian anywhere in the plan),
    * and ordering shingles rarest-document-frequency-first pushes
    * corpus-ubiquitous shingles out of prefixes, so hot-key candidate
    * blowup shrinks as skew grows. The rescore joins shingle sets back by
    * id, so wide arrays never ride the candidate shuffle. Low thresholds
    * approach all-shared-shingle-pairs volume — the honest floor for an
    * EXACT similarity join. Candidates also pass the size-ratio filter
    * (`J >= t` forces `t·|A| <= |B| <= |A|/t`) before the dedup/rescore.
    *
    * Tiny inputs route to a bounded all-pairs rescore instead: under ~1 MB
    * of text (a few thousand documents — low-millions of cheap
    * sorted-array Jaccards) the prefix machinery (frequency agg + rank
    * window + candidate dedup) costs more than scoring every pair, the
    * same measured-size logic by which Spark picks a broadcast-NL join
    * over SMJ. The bound is deliberately conservative because pair count
    * grows QUADRATICALLY in the estimate: both paths are exact, and the
    * cross product can only appear under the size gate.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5,
                        allPairsBytes: Long = 1L << 20): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1] for prefix filtering to be exact " +
        s"(J >= 0 pairs need not share any shingle), got $threshold")
    val withSh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    val sizeEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeEst <= allPairsBytes) {
      // small-relation fast path: the optimizer bounds the product
      val l = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val r = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
      return l.crossJoin(r).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // (id, set size, one row per shingle)
    val toks = withSh.select(col("id"), size(col("sh")).as("_n"),
      explode(col("sh")).as("_s"))
    // rare-first global order: document frequency per shingle (bounded by
    // distinct-shingle count, a token-granularity aggregate)
    val freq = toks.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
    // ceil(t·n) computed in doubles can land one ABOVE the true value
    // when t·n is exactly integral (0.07 × 100 → 7.000000000000001 →
    // ceil 8), which would shorten prefixes / tighten the size filter and
    // silently DROP a qualifying pair. The 1e-9 slack makes the rounding
    // strictly conservative: a boundary case admits at most a few extra
    // candidates (the exact rescore removes them); it can never lose one.
    def ceilConservative(x: Column): Column = ceil(x - lit(1e-9)).cast("int")
    // keep only each doc's prefix: rank shingles (rarest first, shingle
    // text as tiebreak = a total order) and cut at |S| - ceil(t|S|) + 1
    val prefixes = toks.join(freq, Seq("_s"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("_df"), col("_s"))))
      .filter(col("_rn") <=
        col("_n") - ceilConservative(lit(threshold) * col("_n")) + 1)
      .select(col("_s"), col("id"), col("_n"))
    // candidates: prefix-shingle equi-join, canonical orientation, the
    // exact size-ratio filter, then dedup
    val cands = prefixes
      .select(col("_s"), col("id").as("id_a"), col("_n").as("_n_a"))
      .join(prefixes
        .select(col("_s"), col("id").as("id_b"), col("_n").as("_n_b")), Seq("_s"))
      .filter(col("id_a") < col("id_b") &&
        col("_n_b") >= ceilConservative(lit(threshold) * col("_n_a")) &&
        col("_n_a") >= ceilConservative(lit(threshold) * col("_n_b")))
      .select(col("id_a"), col("id_b")).distinct()
    // exact rescore: fetch both shingle sets by id, compute true Jaccard
    cands
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Directional shingle CONTAINMENT pairs: `C(A→B) = |S_A ∩ S_B| / |S_A|`
    * — the asymmetric near-dup measure that catches a document CONTAINED
    * in a longer one (quote inclusion, snippet-of-article, page-within-
    * crawl), which symmetric Jaccard misses whenever the sizes differ a
    * lot (a 20-token snippet inside a 500-token doc has J ≈ 0.04 but
    * C ≈ 1.0). Output `(id_a, id_b, containment)` = pairs with
    * C(A→B) >= threshold; both directions emitted independently.
    *
    * Scale shape: one shingle-granularity explode, one equi-join keyed
    * on the shingle (intersection counts arrive as a map-side-partial
    * groupBy — shingle sets never ride the exchange), sizes joined back
    * on id. A mass-shared shingle ("the end") fans out as df² rows for
    * that key; `maxShingleFreq` drops shingles shared by more than that
    * many docs (stop-shingles carry ~zero containment evidence but
    * dominate join volume). The drop makes C an UNDERCOUNT — pass
    * `maxShingleFreq = Int.MaxValue` for the exact tier (the oracle
    * setting); production corpora keep the cap and accept the
    * conservative bias, the standard PPJoin-family trade.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int = 3, threshold: Double = 0.5,
                       maxShingleFreq: Int = 256): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val withSh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    val sizes = withSh.select(col("id"), size(col("sh")).as("_n"))
      .filter(col("_n") > 0)
    val toks = withSh.select(col("id"), explode(col("sh")).as("_s"))
    val kept =
      if (maxShingleFreq == Int.MaxValue) toks
      else {
        val hot = toks.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxShingleFreq).select(col("_s"))
        toks.join(hot, Seq("_s"), "left_anti")
      }
    val inter = kept.select(col("_s"), col("id").as("id_a"))
      .join(kept.select(col("_s"), col("id").as("id_b")), Seq("_s"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("_n")), Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        (col("_inter").cast("double") / col("_n")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ---------------------------------------------------------------------
  // Span-level (substring) dedup
  // ---------------------------------------------------------------------

  /** Tokens with dense 0-based positions — `trim` before the split keeps
    * positions gap-free so a k-token window is exactly positions
    * `[pos, pos+k-1]`.
    */
  private def denseTokens(df: DataFrame, textCol: String, idCol: String) =
    df.select(col(idCol).as("_id"),
      posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("_pos", "_tok")))
      .filter(length(col("_tok")) > 0)

  /** Shared tail of the span-dedup ops: given duplicate k-gram START
    * positions, expand them to the covered token set, flag every token,
    * and reassemble each document's survivors in original order.
    * Returns `(idCol, textCol, n_toks_kept, n_toks_dropped)`; documents
    * whose every token sat under a duplicated span are removed.
    */
  private def scrubCovered(toks: DataFrame, dupStarts: DataFrame, k: Int,
                           textCol: String, idCol: String): DataFrame = {
    // per-doc covered-position SETS (a doc-keyed aggregate whose dedup
    // rides the map-side partial), then ONE doc-granularity join: both
    // sides leave their groupBys hash-partitioned by doc id, so the join
    // adds no exchange — no token-granularity join anywhere, and the
    // token rows ride exactly one shuffle (the reassembly groupBy)
    val covered = dupStarts
      .select(col("_id").as("_cid"),
        explode(sequence(col("_pos"), col("_pos") + lit(k - 1))).as("_cov"))
      .groupBy(col("_cid"))
      .agg(array_sort(collect_set(col("_cov"))).as("_covs"))
    toks
      .groupBy(col("_id"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_tok"))))
        .as("_sorted"))
      .join(covered, col("_id") === col("_cid"), "left")
      // both arrays arrive sorted → ONE O(tokens + covered) merge walk
      // per doc (a codegen'd kernel) reassembles text and counts
      .withColumn("_r", spanScrubCol(col("_sorted"),
        coalesce(col("_covs"), typedLit(Seq.empty[Int]))))
      .select(
        col("_id").as(idCol),
        col("_r.text").as(textCol),
        col("_r.kept").as("n_toks_kept"),
        col("_r.dropped").as("n_toks_dropped"))
      .filter(col("n_toks_kept") > 0)
  }

  /** Cross-document EXACT SUBSTRING dedup — the k-token-gram cover variant
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better", the suffix-array ExactSubstr dedup): any k-token
    * window whose exact text occurred EARLIER in the corpus (global order
    * = (doc id, position)) has all k covered positions removed from the
    * later document; overlapping duplicate windows merge into one removed
    * span, and survivors reassemble in original order. Only the globally
    * FIRST occurrence survives — later occurrences are scrubbed whether
    * they sit in another document or later in the same one (the Lee et
    * al. rule); repeated boilerplate (licence headers, navigation chrome,
    * quote chains) is removed everywhere it re-appears while the
    * surrounding novel text SURVIVES — the advantage over whole-doc/
    * paragraph dedup, which either keeps the duplicated span or drops
    * the whole unit.
    *
    * Returns `(idCol, textCol, n_toks_kept, n_toks_dropped)`; fully-
    * covered documents are removed (callers re-join other columns on id).
    *
    * Scale shape (everything is token/gram granularity; the wide source
    * row rides no shuffle): one per-doc window builds the k-grams via
    * `lead` (doc-keyed exchange), one gram-keyed window finds each gram's
    * global first occurrence (a mass-duplicated gram lands in ONE sort
    * partition — hot keys cost a sort, not a join blowup, the
    * [[paragraphDedup]] argument), and the covered-position expansion
    * joins back to tokens on (doc, pos) — at most k× the duplicate
    * occurrence count, deduplicated before the join. Unlike the
    * suffix-array original there is no global suffix sort and no driver
    * state; the price is the fixed window k instead of "any match
    * ≥ k tokens" (standard shingle-cover simplification).
    */
  def substringDedup(df: DataFrame, textCol: String, idCol: String,
                     k: Int = 5): DataFrame = {
    require(k >= 2, s"substringDedup: k must be >= 2, got $k")
    val toks = denseTokens(df, textCol, idCol)
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    val gram = concat_ws(" ",
      (0 until k).map(i => if (i == 0) col("_tok") else lead(col("_tok"), i).over(w)): _*)
    val starts = toks
      .withColumn("_gram", gram)
      .withColumn("_full", lead(col("_tok"), k - 1).over(w).isNotNull)
      .filter(col("_full"))
    val dupStarts = starts
      .withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col("_gram").cast("binary")))
          .orderBy(col("_id"), col("_pos"))))
      .filter(col("_rn") > 1)
      .select(col("_id"), col("_pos"))
    scrubCovered(toks, dupStarts, k, textCol, idCol)
  }

  /** WITHIN-document repeated n-gram scrub (the Gopher/Dolma intra-doc
    * repetition filter, as a REPAIR instead of a drop): an n-token window
    * repeating text seen earlier in the SAME document is removed — loops,
    * stutters, and copy-paste runs inside one document — keeping the
    * first occurrence and everything else intact. Cross-document
    * repetition is untouched (that is [[substringDedup]]'s job);
    * documents degenerate enough to be all-repetition disappear, the
    * same signal `trigramRepetition` thresholds on, except the document
    * is salvaged rather than discarded.
    *
    * Same contract and scale shape as [[substringDedup]] minus the global
    * gram exchange: BOTH windows here partition by document (the
    * first-occurrence window on (doc, gram)), so the dedup state never
    * leaves the document's partition — at 100 TB this op shuffles tokens
    * by doc id twice and nothing else, no corpus-wide key exists at all.
    */
  def repeatedNgramScrub(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 2): DataFrame = {
    require(n >= 2, s"repeatedNgramScrub: n must be >= 2, got $n")
    val toks = denseTokens(df, textCol, idCol)
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    val gram = concat_ws(" ",
      (0 until n).map(i => if (i == 0) col("_tok") else lead(col("_tok"), i).over(w)): _*)
    val dupStarts = toks
      .withColumn("_gram", gram)
      .withColumn("_full", lead(col("_tok"), n - 1).over(w).isNotNull)
      .filter(col("_full"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_id"), md5(col("_gram").cast("binary")))
          .orderBy(col("_pos"))))
      .filter(col("_rn") > 1)
      .select(col("_id"), col("_pos"))
    scrubCovered(toks, dupStarts, n, textCol, idCol)
  }
}
