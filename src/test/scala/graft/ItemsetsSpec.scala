package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Itemsets

/** A-Priori 3-itemsets: hand cases, closure pruning, naive parity. */
class ItemsetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def mine(baskets: Seq[(String, String)], minSup: Long,
                   cap: Int = 1000): Map[(String, String, String), Long] =
    Itemsets.frequentTriples(baskets.toDF("b", "i"), "b", "i", minSup, cap)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap

  test("hand case: the one triple at support 2 survives, others don't") {
    val baskets = Seq(
      "b1" -> Seq("x", "y", "z"), "b2" -> Seq("x", "y", "z", "w"),
      "b3" -> Seq("x", "y"), "b4" -> Seq("w", "z"))
      .flatMap { case (b, is) => is.map(b -> _) }
    val out = mine(baskets, 2)
    assert(out == Map(("x", "y", "z") -> 2L))
  }

  test("duplicate (basket, item) rows count once") {
    val baskets = Seq("b1" -> "x", "b1" -> "x", "b1" -> "y", "b1" -> "z",
      "b2" -> "x", "b2" -> "y", "b2" -> "z")
    assert(mine(baskets, 2) == Map(("x", "y", "z") -> 2L))
  }

  test("mega-baskets beyond the cap are excluded from support") {
    // two mega baskets keep all 50 items FREQUENT (support 2), so the
    // cap — which applies to the F1-pruned basket — actually bites
    val big = Seq("huge1", "huge2")
      .flatMap(b => (0 until 50).map(i => b -> s"i$i"))
    val rest = Seq("b1", "b2").flatMap(b => Seq(b -> "i1", b -> "i2", b -> "i3"))
    val capped = mine(big ++ rest, 2, cap = 10)
    assert(capped == Map(("i1", "i2", "i3") -> 2L))
    val uncapped = mine(big ++ rest, 2, cap = 100)
    assert(uncapped(("i1", "i2", "i3")) == 4L)
  }

  test("cappedBaskets emits exactly the excluded baskets with their sizes") {
    val big = Seq("huge1", "huge2")
      .flatMap(b => (0 until 50).map(i => b -> s"i$i"))
    val rest = Seq("b1", "b2").flatMap(b => Seq(b -> "i1", b -> "i2", b -> "i3"))
    val audit = Itemsets.cappedBaskets((big ++ rest).toDF("b", "i"),
        "b", "i", maxBasketItems = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("huge1" -> 50L, "huge2" -> 50L))
    // duplicate rows don't inflate the audited size (distinct granularity)
    val dup = Itemsets.cappedBaskets(
        (big ++ big).toDF("b", "i"), "b", "i", maxBasketItems = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dup == Map("huge1" -> 50L, "huge2" -> 50L))
  }

  test("scratchDir path produces identical triples to the checkpoint path") {
    val baskets = Seq("b1" -> Seq("x", "y", "z"), "b2" -> Seq("x", "y", "z"),
      "b3" -> Seq("x", "z")).flatMap { case (b, is) => is.map(b -> _) }
    val tmp = java.nio.file.Files.createTempDirectory("itemsets_scratch")
    // maxDirectTriples = 0: the scratch materialization only exists on
    // the A-Priori path, so force it
    val viaScratch = Itemsets.frequentTriples(baskets.toDF("b", "i"),
        "b", "i", 2, scratchDir = Some(tmp.toString), maxDirectTriples = 0L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(viaScratch == mine(baskets, 2))
    // the scratch parquet is reclaimed by the cleanup API (the leak fix)
    assert(new java.io.File(tmp.toString).listFiles()
      .exists(_.getName.startsWith("itemsets_")))
    Itemsets.cleanupScratch(spark, tmp.toString)
    assert(!new java.io.File(tmp.toString).listFiles()
      .exists(_.getName.startsWith("itemsets_")))
  }

  test("matches naive enumeration on random baskets") {
    val rnd = new scala.util.Random(17)
    val baskets = (0 until 60).flatMap { b =>
      val items = rnd.shuffle((0 until 12).toList).take(2 + rnd.nextInt(5))
      items.map(i => s"b$b" -> s"i$i")
    }
    val bySet = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val naive = bySet.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
      .map { case (Seq(a, b, c), n) => (a, b, c) -> n }
    assert(mine(baskets, 3) == naive)
  }

  test("A-Priori path (forced) equals the direct path and naive enumeration") {
    val rnd = new scala.util.Random(29)
    val baskets = (0 until 80).flatMap { b =>
      val items = rnd.shuffle((0 until 15).toList).take(3 + rnd.nextInt(6))
      items.map(i => s"b$b" -> s"i$i")
    }
    // maxDirectTriples = 0 forces the downward-closure machinery even on
    // this small domain; the default takes the single-pass direct path
    val apriori = Itemsets.frequentTriples(baskets.toDF("b", "i"),
        "b", "i", 4, maxDirectTriples = 0L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(apriori == mine(baskets, 4))
    val bySet = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naive = bySet.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 4)
      .map { case (Seq(a, b, c), n) => (a, b, c) -> n }
    assert(apriori == naive)
  }
}
