package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Deterministic splits/samples: pure function of the id, stable across
  * runs, partitions disjoint and exhaustive, fractions honored.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("splitByHash: disjoint, exhaustive, deterministic, ~right-sized") {
    val split = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n) // exhaustive
    assert(counts("train") > n * 7 / 10 && counts("train") < n * 9 / 10)
    // deterministic: identical assignment on a second evaluation
    val again = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)
    // membership is id-pure: shuffling the input changes nothing
    val shuffled = Sampling.splitByHash(docs.orderBy(rand(7)), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("doc_id", "split").except(
      shuffled.select("doc_id", "split")).isEmpty)
  }

  test("sampleByHash: stable subset, nested fractions agree") {
    val s10 = Sampling.sampleByHash(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s30)) // smaller fraction nests inside the larger
    val n = docs.count().toDouble
    assert(s10.size > n * 0.03 && s10.size < n * 0.2)
  }

  test("weights not summing to 1 put the remainder in the last split") {
    val a = Sampling.splitByHash(docs, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
    val b = Sampling.splitByHash(docs, "doc_id", Seq("train" -> 0.9, "val" -> 1.0))
    assert(a.select("doc_id", "split").except(b.select("doc_id", "split")).isEmpty)
  }

  test("samplePerGroup: exactly n per class, deterministic, input-order invariant") {
    val out = Sampling.samplePerGroup(docs, "lang", "doc_id", 15)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 15), counts)
    val again = Sampling.samplePerGroup(
        docs.orderBy(org.apache.spark.sql.functions.desc("doc_id")), "lang", "doc_id", 15)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // n larger than the group: the whole group survives
    val all = Sampling.samplePerGroup(docs, "lang", "doc_id", 1000000)
    assert(all.count() == docs.count())
  }

  test("sampleMixture: per-group rates, nested kept-sets, unknown groups use default") {
    val m = Sampling.sampleMixture(docs, "source", "doc_id",
      Map("src0" -> 0.2, "src1" -> 0.6), defaultFraction = 1.0)
    val kept = m.select("doc_id").as[Long].collect().toSet
    // nested: raising a rate only ADDS rows for that group
    val m2 = Sampling.sampleMixture(docs, "source", "doc_id",
      Map("src0" -> 0.5, "src1" -> 0.6))
    assert(kept.subsetOf(m2.select("doc_id").as[Long].collect().toSet))
    // default keeps untouched groups whole
    val untouched = docs.filter(!col("source").isin("src0", "src1"))
    assert(m.filter(!col("source").isin("src0", "src1")).count() == untouched.count())
    // rate 0 removes the group entirely
    val none = Sampling.sampleMixture(docs, "source", "doc_id", Map("src0" -> 0.0))
    assert(none.filter(col("source") === "src0").count() == 0)
  }

  test("temperatureMixture: alpha=1 is uniform; alpha<1 upsamples small groups; deterministic") {
    import spark.implicits._
    val df = (0L until 900L).map(i => (i, if (i < 800) "big" else "small"))
      .toDF("id", "grp")
    // alpha=1, budget=total -> rate 1 everywhere: everything kept
    assert(Sampling.temperatureMixture(df, "grp", "id", 1.0, 900L).count() == 900)
    // alpha=0.5: keep rates r_g = budget * sqrt(n_g)/tot / n_g — the small
    // group's rate exceeds the big group's by sqrt(800/100) ≈ 2.83x
    val kept = Sampling.temperatureMixture(df, "grp", "id", 0.5, 300L)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigRate = kept("big").toDouble / 800
    val smallRate = kept("small").toDouble / 100
    assert(smallRate > bigRate * 2.0, s"small=$smallRate big=$bigRate")
    // membership is a pure function of the id: stable across runs
    val a = Sampling.temperatureMixture(df, "grp", "id", 0.5, 300L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(df.orderBy(rand(7)), "grp", "id", 0.5, 300L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // budgets nest: everything kept at 150 is kept at 300
    val half = Sampling.temperatureMixture(df, "grp", "id", 0.5, 150L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(a))
  }

  test("weightedSample: fixed k, deterministic, weight-0 excluded, matches reference") {
    val d = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("w"))
    val sel = Sampling.weightedSample(d, "doc_id", col("w"), k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.size == 50)
    // identical on re-evaluation
    val again = Sampling.weightedSample(d, "doc_id", col("w"), k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sel)
    // matches a driver-side reference of the same A-ES key
    val rows = d.collect().map(r => (r.getLong(0), r.getLong(1)))
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id-s42".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      -math.log((h + 1).toDouble / 4503599627370496.0) / w.toDouble
    }
    val expect = rows.filter(_._2 > 0)
      .sortBy { case (id, w) => (key(id, w), id) }.take(50).map(_._1).toSet
    assert(sel == expect)
    // zero-weight rows can never be selected
    val withZero = d.withColumn("w",
      when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("w")))
    val sel2 = Sampling.weightedSample(withZero, "doc_id", col("w"), k = 50)
      .select("doc_id").collect().map(_.getLong(0))
    assert(sel2.forall(_ % 2 != 0))
  }

  test("interleaveWeighted: densities follow rates, schedule deterministic and even") {
    val d = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "grp")
    val ranked = Sampling.interleaveWeighted(d, "grp", "id",
      Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.25))
    val first80 = ranked.orderBy(col("interleave_key"), col("grp"), col("id"))
      .limit(80).groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // in any prefix of length L the counts approach L*(4:2:1)/7
    assert(first80("a") > first80("b") && first80("b") > first80("c"), first80.toString)
    assert(math.abs(first80("a") - 80.0 * 4 / 7) <= 2, first80.toString)
    // evenness: within the first 40 the dominant group never runs 4-in-a-row
    val order = ranked.orderBy(col("interleave_key"), col("grp"), col("id"))
      .limit(40).select("grp").collect().map(_.getString(0)).toSeq
    assert(!order.sliding(4).exists(w => w.forall(_ == "a")), order.toString)
    // deterministic across evaluations
    val again = ranked.orderBy(col("interleave_key"), col("grp"), col("id"))
      .limit(40).select("grp").collect().map(_.getString(0)).toSeq
    assert(again == order)
    // unknown groups take the default rate
    val withU = d.union(Seq((1000L, "u")).toDF("id", "grp"))
    val keyed = Sampling.interleaveWeighted(withU, "grp", "id",
      Map("a" -> 1.0), defaultRate = 0.5)
    val uKey = keyed.filter(col("grp") === "u").head.getDouble(2)
    assert(uKey == 2.0) // rank 1 / 0.5
  }

  test("shuffleDeterministic: a real permutation, stable across runs and input order") {
    val out = Sampling.shuffleDeterministic(docs, "doc_id", 7L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(out.length == docs.count())
    // pos is a dense 0..n-1 sequence within every shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // pure function of (seed, id): input order is irrelevant
    val reversed = Sampling.shuffleDeterministic(
        docs.orderBy(org.apache.spark.sql.functions.desc("doc_id")), "doc_id", 7L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(out.toSet == reversed.toSet)
    // a different seed produces a different permutation
    val other = Sampling.shuffleDeterministic(docs, "doc_id", 8L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(out.toSet != other.toSet)
    // and it is not the identity order: some shard's positions differ from
    // ascending doc_id order
    val byShard = out.groupBy(_._2).values
    assert(byShard.exists { rows =>
      val inPosOrder = rows.sortBy(_._3).map(_._1).toSeq
      inPosOrder != inPosOrder.sorted
    })
  }
}
