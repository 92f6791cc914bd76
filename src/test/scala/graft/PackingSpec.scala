package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing
import graft.functions.TextFunctions

/** Sequence packing (contiguous-fill) and PII redaction contracts. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("packSequences equals a sequential per-group reference fill") {
    val rows = for {
      g <- Seq("a", "b"); i <- 1 to 200
    } yield (g, i.toLong, (i * 37 % 90) + 10) // tokens in [10, 99]
    val df = rows.toDF("grp", "id", "tok")
    val got = Packing.packSequences(df, "tok", "grp", "id", 256)
      .select("grp", "id", "seq_no").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

    // reference: walk each group in order, accumulate, floor-divide
    for (g <- Seq("a", "b")) {
      var cum = 0L
      rows.filter(_._1 == g).sortBy(_._2).foreach { case (_, id, tok) =>
        val expected = cum / 256
        assert(got((g, id)) == expected, s"doc $g/$id")
        cum += tok
      }
    }
  }

  test("packing is deterministic and sequences fill to the budget") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("tok"))
    val s1 = Packing.packingSummary(d, "tok", "lang", "doc_id", 2048)
      .orderBy("lang", "seq_no").collect()
    val s2 = Packing.packingSummary(d, "tok", "lang", "doc_id", 2048)
      .orderBy("lang", "seq_no").collect()
    assert(s1.toSeq == s2.toSeq)
    // every non-final sequence of a group holds >= the budget minus the
    // max doc size of the NEXT doc — contiguous fill never leaves a gap a
    // whole sequence wide: seq k exists => seqs 0..k-1 exist
    val byLang = s1.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      val seqs = rows.map(_.getLong(1)).sorted
      assert(seqs.zipWithIndex.forall { case (s, i) => s == i.toLong })
    }
  }

  test("chunkTokens: window boundaries, overlap, short docs, blank text") {
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(toks, "one two", "", "   ").toDF("text")
      .select(TextFunctions.chunkTokens(col("text"), 4, 1).as("c"))
    val out = df.as[Seq[String]].collect()
    // 10 tokens, size 4, step 3 -> starts at 1,4,7,10
    assert(out(0) == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out(1) == Seq("one two")) // shorter than one chunk
    assert(out(2).isEmpty && out(3).isEmpty)
    // every chunk except possibly the last is exactly chunkSize tokens;
    // consecutive chunks overlap by exactly `overlap` tokens
    val chunks = out(0).map(_.split(" ").toSeq)
    assert(chunks.init.forall(_.length == 4))
    chunks.sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(1) == b.take(1))
    }
  }

  test("materializeSequences: ordered concatenation with separators, budget respected") {
    val docs = Seq(
      ("s", 1L, "one one", 2L), ("s", 2L, "two", 1L),
      ("s", 3L, "three three three", 3L), ("s", 4L, "four", 1L)
    ).toDF("shard", "doc_id", "text", "tok")
    val out = Packing.materializeSequences(docs, "text", "tok", "shard", "doc_id",
        maxTokens = 4, sep = "|")
      .orderBy("seq_no")
      .select("seq_no", "n_docs", "n_tokens", "sequence_text")
      .as[(Long, Long, Long, String)].collect()
    // contiguous fill: docs 1,2 -> seq 0 (3 tokens); doc 3 -> seq 0? cum=6
    // -> (6-3)/4 = 0 -> seq 0; doc 4 cum=7 -> (7-1)/4 = 1 -> seq 1
    assert(out(0) == ((0L, 3L, 6L, "one one|two|three three three")), out.toSeq)
    assert(out(1) == ((1L, 1L, 1L, "four")), out.toSeq)
  }

  test("redactPii scrubs emails, urls, and long digit runs — nothing else") {
    val df = Seq(
      "contact bob.smith+x@example.co.uk today",
      "see https://example.com/a?b=1 and http://x.org",
      "card 4111111111111111 phone 5551234567 zip 02139",
      "plain text stays untouched 123"
    ).toDF("text").select(TextFunctions.redactPii(col("text")).as("t"))
    val out = df.as[String].collect()
    assert(out(0) == "contact <EMAIL> today")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2) == "card <NUMBER> phone <NUMBER> zip 02139")
    assert(out(3) == "plain text stays untouched 123")
  }
}
