package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IncrementalDedup}

/** Incremental dedup index: batch-at-a-time dedup against a persisted
  * signature index, keep-first across batches, rep forwarding across
  * chains, and batch-path equality on chain-free corpora.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("inc_dedup_").toString

  test("exact tier: keep-first across batches, index matches drop later copies") {
    val inc = new IncrementalDedup(spark, freshRoot(), nearDup = false)
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "alpha  BETA gamma"),
      (3L, "unique one")).toDF("doc_id", "text")
    val r1 = inc.addBatch(b1, "text", "doc_id")
    assert(r1.nIn == 3 && r1.nKept == 2)
    assert(r1.nDroppedWithinBatch == 1 && r1.nDroppedVsIndex == 0)
    assert(r1.survivors.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // batch 2: one index dup (normalized match of doc 1), one fresh doc
    val b2 = Seq((10L, "ALPHA beta   gamma"), (11L, "unique two"))
      .toDF("doc_id", "text")
    val r2 = inc.addBatch(b2, "text", "doc_id")
    assert(r2.nKept == 1 && r2.nDroppedVsIndex == 1)
    assert(r2.survivors.collect().map(_.getLong(0)).toSeq == Seq(11L))
    // the dropped doc's rep forwards to the ORIGINAL survivor
    val reps = inc.indexedDocs.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(reps(10L) == 1L && reps(2L) == 1L && reps(11L) == 11L)
  }

  test("near-dup chain across batches resolves to the original survivor") {
    val inc = new IncrementalDedup(spark, freshRoot(), threshold = 0.7)
    val base = (1 to 20).map(i => s"t$i")
    val a = base.mkString(" ")                                // batch 1
    val b = (base ++ Seq("u1", "u2", "u3")).mkString(" ")     // ~0.87 of a
    val c = (base ++ Seq("u1", "u2")).mkString(" ")           // ~0.95 of b
    val r1 = inc.addBatch(Seq((1L, a)).toDF("doc_id", "text"), "text", "doc_id")
    assert(r1.nKept == 1)
    val r2 = inc.addBatch(Seq((2L, b)).toDF("doc_id", "text"), "text", "doc_id")
    assert(r2.nKept == 0 && r2.nDroppedVsIndex == 1)
    val r3 = inc.addBatch(Seq((3L, c)).toDF("doc_id", "text"), "text", "doc_id")
    assert(r3.nKept == 0 && r3.nDroppedVsIndex == 1)
    // c matched b (dropped) and/or a — either way its rep must be the
    // TERMINAL survivor 1, never the dropped 2
    val reps = inc.indexedDocs.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(reps(2L) == 1L && reps(3L) == 1L)
  }

  test("reopening with different signature parameters is refused loudly") {
    val root = freshRoot()
    val inc = new IncrementalDedup(spark, root, numHashes = 64)
    inc.addBatch(Seq((1L, "some document text here")).toDF("doc_id", "text"),
      "text", "doc_id")
    val wrong = new IncrementalDedup(spark, root, numHashes = 128)
    val e = intercept[IllegalArgumentException](wrong.addBatch(
      Seq((2L, "more text")).toDF("doc_id", "text"), "text", "doc_id"))
    assert(e.getMessage.contains("p.numHashes"))
  }

  test("recurring exact content does not grow its LSH bucket") {
    val root = freshRoot()
    val inc = new IncrementalDedup(spark, root)
    val boiler = "the same boilerplate arrives in every single batch again"
    for (b <- 1 to 4)
      inc.addBatch(Seq((b * 100L, boiler),
        (b * 100L + 1, s"fresh content number $b with its own words"))
        .toDF("doc_id", "text"), "text", "doc_id")
    // bands hold ONE row set for the boilerplate (batch 1's rep) + one
    // per fresh doc — 5 distinct band-indexed docs, not 8
    val banded = graft.storage.VersionedTable(spark, s"$root/bands")
      .read.select("bid").distinct().count()
    assert(banded == 5, s"banded docs: $banded")
    // while the docs table still records every arrival's rep lineage
    val reps = inc.indexedDocs.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(reps.size == 8 && reps(400L) == 100L)
  }

  test("chain-free corpus: two incremental batches equal the batch dedup") {
    val rnd = new scala.util.Random(99L)
    // exact 3-copy groups, near-dup pairs (J ~ 0.9), and uniques —
    // margins far outside the 64-hash estimate's sigma so the index's
    // estimate tier cannot flip a verdict
    val docs = (0 until 30).flatMap { g =>
      val toks = Seq.fill(30)(s"w${rnd.nextInt(500)}_$g")
      val text = toks.mkString(" ")
      val id = g * 10L
      g % 3 match {
        case 0 => Seq((id, text), (id + 1, text), (id + 2, text))
        case 1 => Seq((id, text), (id + 1, (toks :+ s"x$g").mkString(" ")))
        case _ => Seq((id, text))
      }
    }
    val df = docs.toDF("doc_id", "text")
    val batchSurvivors = Dedup.minhashDedupExact(df, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet

    val inc = new IncrementalDedup(spark, freshRoot())
    val mid = docs.map(_._1).sorted.apply(docs.length / 2)
    val r1 = inc.addBatch(df.filter(col("doc_id") <= mid), "text", "doc_id")
    val r2 = inc.addBatch(df.filter(col("doc_id") > mid), "text", "doc_id")
    val incSurvivors =
      (r1.survivors.collect() ++ r2.survivors.collect())
        .map(_.getLong(0)).toSet
    assert(incSurvivors == batchSurvivors,
      s"inc-only: ${incSurvivors -- batchSurvivors}; " +
        s"batch-only: ${batchSurvivors -- incSurvivors}")
  }
}
