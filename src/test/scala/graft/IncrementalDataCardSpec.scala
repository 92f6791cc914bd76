package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DataCard, IncrementalDataCard}
import graft.storage.VersionedTable

/** The delta-maintained data card must EQUAL the batch card over the net
  * corpus — same schema, same values, interpolated median included —
  * under appends AND deletes, with delta-only refreshes.
  */
class IncrementalDataCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "web", "the cat and the dog sat with the mat"),
    (2L, "en", "web", "the cat and the dog sat with the mat"), // exact dup
    (3L, "en", "book", "a longer text that is full of the and of and is"),
    (4L, "de", "web", "der hund und die katze ist nicht hier mit ein"),
    (5L, "de", "web", "die sonne ist nicht der mond und das meer"),
    (6L, "en", "web", "this is that and for with the of the end"),
    (7L, "en", "web", "short the of and")
  ).toDF("doc_id", "lang", "source", "text")

  test("two appends + a delete window equal the batch card over the net corpus") {
    val root = java.nio.file.Files.createTempDirectory("inc_card").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val card = IncrementalDataCard(spark, src, s"$root/state",
      "text", "lang", "source")

    src.append(docs.filter(col("doc_id") <= 4))
    assert(card.refresh() == 1L)
    src.append(docs.filter(col("doc_id") > 4))
    assert(card.refresh() == 1L)
    src.deleteWhere(col("doc_id") === 2L || col("doc_id") === 5L)
    assert(card.refresh() == 1L)
    assert(card.refresh() == 0L)

    val net = docs.filter(col("doc_id") =!= 2L && col("doc_id") =!= 5L)
    val want = DataCard.summarize(net, "text", "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val got = card.card
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(got.keySet == want.keySet, s"segments: $got vs $want")
    got.foreach { case (k, v) =>
      assert(v == want(k), s"segment $k: $v != ${want(k)}")
    }
    // the exact-dup delete really exercised the ck multiset: en/web had
    // docs {1,2,6,7} with 1 ≡ 2 (n_docs=4, n_unique=3); deleting doc 2
    // decrements the shared content's count to 1, so it still counts once
    val enWeb = got(("en", "web"))
    assert(enWeb(2) == 3L && enWeb(3) == 3L, enWeb.toString) // n_docs, n_unique

    // folding the ck signed log in place (the OPTIMIZE of this state)
    // changes neither the card nor the consumed offset
    card.compactCk()
    val gotC = card.card
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(gotC == got, "compactCk changed the card")
    assert(card.refresh() == 0L, "compactCk must preserve the offset")
  }

  test("property: random append/delete rounds always equal the batch card") {
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(8L)
    val langs = Seq("en", "de", "fr")
    val words = Seq("the", "and", "der", "und", "le", "la", "cat", "dog",
      "x1", "x2", "x3")
    def randDoc(id: Long): (Long, String, String, String) = {
      val n = 1 + rnd.nextInt(12)
      (id, langs(rnd.nextInt(3)), s"s${rnd.nextInt(2)}",
        Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val root = java.nio.file.Files.createTempDirectory("inc_card_prop").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val card = IncrementalDataCard(spark, src, s"$root/state",
      "text", "lang", "source")
    var live = Vector.empty[(Long, String, String, String)]
    var nextId = 0L
    (1 to 4).foreach { round =>
      // append a random batch (with intentional duplicate texts)
      val batch = (0 until 30).map { _ => nextId += 1; randDoc(nextId) }
      live ++= batch
      src.append(batch.toDF("doc_id", "lang", "source", "text"))
      assert(card.refresh() == 1L)
      // delete a random subset of LIVE rows
      if (round % 2 == 0) {
        val victims = live.filter(_ => rnd.nextBoolean()).map(_._1).toSet
        if (victims.nonEmpty) {
          src.deleteWhere(col("doc_id").isin(victims.toSeq: _*))
          live = live.filterNot(v => victims.contains(v._1))
          assert(card.refresh() == 1L)
        }
      }
      val want = DataCard.summarize(
        live.toDF("doc_id", "lang", "source", "text"),
        "text", "lang", "source")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      val got = card.card
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      assert(got == want, s"round $round: $got != $want")
    }
  }

  test("interpolated median matches percentile() for even-sized groups") {
    val root = java.nio.file.Files.createTempDirectory("inc_card_med").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val card = IncrementalDataCard(spark, src, s"$root/state",
      "text", "lang", "source")
    // token counts 2,3,5,9 -> percentile 0.5 = (3+5)/2 = 4.0
    src.append(Seq(
      (1L, "en", "w", "a b"), (2L, "en", "w", "a b c"),
      (3L, "en", "w", "a b c d e"), (4L, "en", "w", "a b c d e f g h i"))
      .toDF("doc_id", "lang", "source", "text"))
    assert(card.refresh() == 1L)
    val r = card.card.head
    assert(r.getAs[Double]("p50_tok") == 4.0, r.toString)
    assert(r.getAs[Long]("min_tok") == 2L && r.getAs[Long]("max_tok") == 9L)
  }
}
