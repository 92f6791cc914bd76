package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("train learns the most frequent pairs first, deterministically") {
    // "aaab" x3, "aab" x2: pair (a,a) dominates, then (aa,a) etc.
    val corpus = Seq("aaab aaab aaab aab aab").toDF("text")
    val v1 = Bpe.train(corpus, "text", 3)
    val v2 = Bpe.train(corpus, "text", 3)
    assert(v1.merges == v2.merges, "training must be deterministic")
    assert(v1.merges.head == ("a", "a"),
      s"(a,a) occurs 8 weighted times — must merge first, got ${v1.merges}")
    assert(v1.merges.size == 3)
  }

  test("encode applies merges greedily; concatenated tokens reconstruct the word") {
    val corpus = Seq(("low low low lower lower newest newest newest newest widest")).toDF("text")
    val vocab = Bpe.train(corpus, "text", 20)
    val toks = Bpe.encode(Seq("lowest newest").toDF("text"), "text", vocab)
      .select("tokens").head.getSeq[String](0)
    // every word reconstructs exactly (tokens partition the word + </w>)
    val rebuilt = toks.mkString("").split(java.util.regex.Pattern.quote(Bpe.EOW))
      .filter(_.nonEmpty).toSeq
    assert(rebuilt == Seq("lowest", "newest"), s"$toks")
    // "newest" was seen 4x in training: it should compress to few tokens
    val newestTokens = {
      val all = Bpe.encode(Seq("newest").toDF("text"), "text", vocab)
        .select("tokens").head.getSeq[String](0)
      all
    }
    assert(newestTokens.length <= 3, s"trained word should compress: $newestTokens")
  }

  test("tokenCount: learned vocab counts fewer tokens than characters, null-safe") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val vocab = Bpe.train(docs, "text", 50)
    assert(vocab.merges.size == 50)
    val counted = Bpe.tokenCount(docs, "text", vocab)
    val rows = counted.selectExpr("n_bpe_tokens", "length(text) AS n_chars")
      .collect()
    assert(rows.forall(r => r.getInt(0) > 0 && r.getInt(0) <= r.getInt(1) + 200))
    // merges actually fire on real text: total BPE tokens < total chars
    val (tok, ch) = rows.map(r => (r.getInt(0).toLong, r.getInt(1).toLong))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(tok < ch, s"learned merges should compress: $tok tokens vs $ch chars")
    val n = Bpe.encode(Seq((null: String)).toDF("text"), "text", vocab)
      .select("tokens").head
    assert(n.isNullAt(0))
  }
}
