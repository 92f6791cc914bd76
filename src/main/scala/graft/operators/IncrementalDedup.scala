package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

import graft.plans.expressions.{minhashText, normalizedText, sigAgreement}
import graft.storage.VersionedTable

/** Result of one [[IncrementalDedup.addBatch]]: the delta rows that
  * survived, plus how the dropped rows resolved.
  */
final case class DedupBatchResult(survivors: DataFrame, nIn: Long,
                                  nKept: Long, nDroppedWithinBatch: Long,
                                  nDroppedVsIndex: Long)

/** Incremental corpus deduplication — the dedup tier's counterpart of
  * [[IncrementalDistinct]]: a persisted SIGNATURE INDEX that each arriving
  * batch dedups against WITHOUT rescanning the corpus, the accumulated-
  * index semantics production dedup services use (new documents are
  * checked against everything that ever arrived; kept survivors are never
  * retroactively merged).
  *
  * Index state under `indexRoot` (versioned commits; no document text —
  * the index is signatures, a few hundred bytes/doc regardless of
  * document size):
  *
  *  - `docs`:  one row per EVER-ARRIVED doc `(id, ck, sig, rep_id)` —
  *    `ck` the 128-bit normalized-content key, `sig` the k-wise MinHash
  *    signature (the index's parameters are pinned in the table's
  *    offsets and a mismatched reopen is refused loudly), `rep_id`
  *    the surviving representative the doc resolved to. DROPPED docs
  *    stay indexed: their signature still witnesses future near-dups,
  *    and their `rep_id` forwards to the original survivor — a chain
  *    A←B←C discovered across three batches resolves C to A (rep ids
  *    are terminal by induction: every appended rep_id is either the
  *    doc's own id or an already-terminal index rep).
  *  - `bands`: `(band, bucket, bid)` LSH banding rows — the near-dup
  *    probe surface. Batches probe it with an equi-join on
  *    (band, bucket); the delta side is batch-sized. Only CONTENT THE
  *    INDEX HAS NEVER SEEN is banded: exact dups (within-batch or vs the
  *    index) carry signatures identical to their already-banded rep, so
  *    indexing them would add zero recall while growing that rep's
  *    bucket by one per recurrence — recurring boilerplate would heat
  *    its LSH bucket without bound.
  *
  * Within a batch, dedup is the full exact tier + banded near-dup tier
  * with EXACT Jaccard rescore (the batch's text is in hand; min id wins).
  * Against the index, exact matches resolve by content key, and near-dup
  * candidates resolve by the signature-agreement estimate
  * (`sigAgreement`) — the standard index trade: corpus text is not
  * stored, so index candidates cannot be exactly rescored (σ ≈ 0.06 at
  * 64 hashes; callers needing exact index rescore keep the corpus table
  * and join candidates back by id). Exact-matched reps never reach the
  * banding probe, so mass-duplicated content costs the content-key join,
  * not a hot LSH bucket — the [[Dedup.minhashDedupExact]] design.
  *
  * Documented divergence from batch [[Dedup.minhashDedupExact]]: a later
  * doc that links two ALREADY-KEPT survivors cannot retroactively merge
  * them (both were emitted). On chain-free corpora the incremental
  * result equals the batch result exactly (IncrementalDedupSpec pins
  * this).
  *
  * NOT idempotent: replaying a batch matches itself in the index. Drive
  * batches exactly once — e.g. from a [[graft.changefeed.ChangeFeed]]
  * window, whose offset-in-commit consumption provides the exactly-once
  * envelope.
  *
  * Scale shape: every job is delta-driven — index scans read only the
  * columns they need (ck+rep_id for the exact join, band rows for the
  * probe, sigs only for the candidate ids), the delta side of every join
  * is batch-sized, and the index grows by one append commit per table
  * per batch. A 100 TB corpus with 1 GB daily deltas probes and extends
  * the index in delta time.
  */
final class IncrementalDedup(spark: SparkSession, indexRoot: String,
                             shingleSize: Int = 3, numHashes: Int = 64,
                             bands: Int = 32, threshold: Double = 0.7,
                             maxBucketSize: Int = 512,
                             nearDup: Boolean = true) {
  require(numHashes % bands == 0, "bands must divide numHashes")
  private val rowsPerBand = numHashes / bands

  private def docsT = VersionedTable(spark, s"$indexRoot/docs")
  private def bandsT = VersionedTable(spark, s"$indexRoot/bands")

  // the signature parameters are part of the index's identity: reopening
  // with different ones would make bandBucket slice different signature
  // ranges (probes silently match nothing) and sigAgreement null out on
  // length mismatch — unbounded recall loss with no error. Pin them in
  // the docs table's offsets (they ride every commit) and refuse a
  // mismatched reopen loudly.
  private val paramOffsets = Map(
    "p.shingleSize" -> shingleSize.toLong,
    "p.numHashes" -> numHashes.toLong,
    "p.bands" -> bands.toLong,
    "p.threshold_e6" -> math.round(threshold * 1e6))
  private def validateParams(): Unit = {
    val o = docsT.offsets
    paramOffsets.foreach { case (k, v) =>
      o.get(k).foreach(stored => require(stored == v,
        s"incremental dedup index at $indexRoot was built with $k=$stored; " +
          s"reopened with $k=$v — use the original parameters"))
    }
  }

  // commits across batches must agree exactly (incl. nullability flags,
  // which joins/checkpoints perturb) — pin both tables to fixed schemas
  private val docsSchema = StructType(Seq(
    StructField("id", LongType), StructField("ck", StringType),
    StructField("sig", ArrayType(LongType)), StructField("rep_id", LongType)))
  private val bandsSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("bid", LongType)))

  /** Every doc the index has ever seen: (id, ck, sig, rep_id). */
  def indexedDocs: DataFrame = docsT.read

  /** A caller-tracked offset riding the docs commits (e.g. a streaming
    * batch id passed via addBatch's extraOffsets); -1 when never set.
    */
  def appliedOffset(key: String): Long = docsT.offsets.getOrElse(key, -1L)

  /** Dedup `delta` against everything that has ever arrived, then fold
    * the whole batch (survivors AND dropped, with terminal rep ids) into
    * the index. Returns the surviving `delta` rows with their original
    * columns.
    */
  def addBatch(delta: DataFrame, textCol: String, idCol: String,
               extraOffsets: Map[String, Long] = Map.empty): DedupBatchResult = {
    if (docsT.exists) validateParams()
    val d = delta
      .select(col(idCol).cast("long").as("id"), col(textCol).as("_text"))
      .withColumn("ck", md5(normalizedText(col("_text")).cast("binary")))
      .withColumn("sig", minhashText(col("_text"), shingleSize, numHashes))
      .localCheckpoint(true) // batch-sized; feeds several jobs below
    val nIn = d.count()

    // ---- within-batch tier 1: exact content collapse (min id per ck)
    val m1 = d.select(col("id"), col("ck"))
      .join(d.groupBy(col("ck")).agg(min(col("id")).as("_rep")), Seq("ck"))
      .select(col("id"), col("_rep"))
    val reps1 = d.join(
      m1.filter(col("id") === col("_rep")).select(col("id")),
      Seq("id"), "left_semi")

    // ---- within-batch tier 2: banded near-dups among the exact reps,
    // EXACT shingle rescore, connected components → min-id rep
    val m2: DataFrame =
      if (!nearDup)
        reps1.select(col("id").as("_rep"), col("id").as("_rep2"))
      else {
        // band the signatures d already carries — no second minhash pass
        val pairs = Dedup.candidatePairsFromSigs(
          reps1.select(col("id"), col("sig")), bands, rowsPerBand,
          maxBucketSize)
        val sh = reps1.select(col("id"),
          Dedup.shingles(col("_text"), shingleSize).as("_sh"))
        val scored = pairs
          .join(sh.select(col("id").as("id_a"), col("_sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("_sh").as("sh_b")), "id_b")
          .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= threshold)
          .select(col("id_a"), col("id_b"))
        val cc = Dedup.connectedComponents(scored)
        reps1.select(col("id"))
          .join(cc, Seq("id"), "left")
          .select(col("id").as("_rep"),
            coalesce(col("component"), col("id")).as("_rep2"))
      }
    // full within-batch mapping: id → exact rep → component rep
    val withinRep = m1.join(m2, Seq("_rep"))
      .select(col("id"), col("_rep2").as("_wrep"))
      .localCheckpoint(true)
    val batchReps = d.join(
      withinRep.filter(col("id") === col("_wrep")).select(col("id")),
      Seq("id"), "left_semi")

    // ---- index probe: exact content hits are computed for ALL exact
    // reps (not just the near-tier survivors) — they also gate which
    // docs' band rows are worth indexing below
    val exactIdxHit: DataFrame =
      if (!docsT.exists)
        reps1.select(col("id"), lit(0L).as("_hit")).limit(0)
      else
        reps1.select(col("id"), col("ck"))
          .join(docsT.read.select(col("ck"), col("rep_id").as("_xrep")),
            Seq("ck"))
          .groupBy(col("id")).agg(min(col("_xrep")).as("_hit"))

    // batch rep id → surviving index rep (null = none)
    val probed: DataFrame =
      if (!docsT.exists)
        batchReps.select(col("id").as("_wrep"),
          lit(null).cast("long").as("_irep"))
      else {
        val nearHit: DataFrame =
          if (!nearDup) exactIdxHit.limit(0)
          else {
            // only reps with NO exact hit reach the banding probe
            val probe = batchReps.join(exactIdxHit.select(col("id")),
                Seq("id"), "left_anti")
              .select(col("id"), col("sig"),
                explode(sequence(lit(0), lit(bands - 1))).as("band"))
              .withColumn("bucket",
                Dedup.bandBucket(col("sig"), col("band"), rowsPerBand))
            val candIds = probe.join(bandsT.read, Seq("band", "bucket"))
              .select(col("id"), col("bid")).distinct()
            val idxSigs = docsT.read
              .select(col("id").as("bid"), col("sig").as("_xsig"),
                col("rep_id").as("_xrep"))
            candIds
              .join(batchReps.select(col("id"), col("sig")), Seq("id"))
              .join(idxSigs, Seq("bid"))
              .filter(sigAgreement(col("sig"), col("_xsig")) >= threshold)
              .groupBy(col("id")).agg(min(col("_xrep")).as("_hit"))
          }
        val hits = exactIdxHit.union(nearHit)
          .groupBy(col("id")).agg(min(col("_hit")).as("_irep"))
        batchReps.select(col("id")).join(hits, Seq("id"), "left")
          .select(col("id").as("_wrep"), col("_irep"))
      }

    // final rep per batch doc: index rep of its within-rep if matched,
    // else the within-rep itself (then it IS a survivor)
    val finalRep = withinRep.join(probed, Seq("_wrep"))
      .select(col("id"), coalesce(col("_irep"), col("_wrep")).as("rep_id"))
      .localCheckpoint(true)

    val nDroppedWithin = withinRep.filter(col("id") =!= col("_wrep")).count()
    val nDroppedVsIndex = probed.filter(col("_irep").isNotNull).count()
    val survivorIds = finalRep.filter(col("id") === col("rep_id"))
      .select(col("id").as("__sid"))
    val survivors = delta.join(survivorIds,
      col(idCol).cast("long") === col("__sid"), "left_semi")
    val nKept = nIn - nDroppedWithin - nDroppedVsIndex

    // ---- fold the batch into the index: bands first (an orphan band row
    // with no docs row matches nothing — crash between the two commits is
    // harmless), docs second. Band rows are indexed ONLY for content the
    // index has never seen: within-batch exact dups and exact index hits
    // have IDENTICAL signatures to their already-banded rep, so their
    // rows would add zero recall while growing that rep's bucket by one
    // per recurrence — mass-duplicated boilerplate (one copy per daily
    // batch) would otherwise heat its LSH bucket without bound. Near-dup
    // drops DO keep their bands: their signatures are distinct and
    // witness future chain links.
    if (nearDup) {
      val bandDocs = reps1.select(col("id"), col("sig"))
        .join(exactIdxHit.select(col("id")), Seq("id"), "left_anti")
      val newBands = bandDocs
        .select(col("id").as("bid"), col("sig"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"))
        .withColumn("bucket",
          Dedup.bandBucket(col("sig"), col("band"), rowsPerBand))
        .select(col("band"), col("bucket"), col("bid")).to(bandsSchema)
      if (bandsT.exists) bandsT.append(newBands)
      else bandsT.overwrite(newBands)
    }
    val newDocs = d.select(col("id"), col("ck"), col("sig"))
      .join(finalRep, Seq("id")).to(docsSchema)
    if (docsT.exists) docsT.append(newDocs, paramOffsets ++ extraOffsets)
    else docsT.overwrite(newDocs, paramOffsets ++ extraOffsets)

    DedupBatchResult(survivors, nIn, nKept, nDroppedWithin, nDroppedVsIndex)
  }
}
