package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontaminate, IncrementalDecontaminate}
import graft.storage.VersionedTable

class IncrementalDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def gramSet(idx: IncrementalDecontaminate): Set[String] =
    idx.grams.collect().map(_.getString(0)).toSet

  test("two-increment index equals the from-scratch benchmark gram set") {
    val root = Files.createTempDirectory("incdecon_").toString
    val bench = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta gamma delta epsilon"),
      (3L, "zeta eta theta iota")
    ).toDF("id", "text")
    val src = VersionedTable(spark, s"$root/bench", collectStats = false)
    val idx = IncrementalDecontaminate(spark, src, s"$root/state", "text", n = 3)

    src.append(bench.filter($"id" <= 2))
    assert(idx.refresh() == 1L)
    src.append(bench.filter($"id" > 2))
    assert(idx.refresh() == 1L)
    assert(idx.refresh() == 0L) // already current

    val oneShot = Decontaminate.benchmarkGrams(bench, "text", 3)
      .collect().map(_.getString(0)).toSet
    assert(gramSet(idx) == oneShot)
  }

  test("deletes retract grams exactly: a rewrite removing a doc removes its unique grams") {
    val root = Files.createTempDirectory("incdecon_del_").toString
    val src = VersionedTable(spark, s"$root/bench", collectStats = false)
    val idx = IncrementalDecontaminate(spark, src, s"$root/state", "text", n = 2)
    src.append(Seq((1L, "a b c"), (2L, "b c d")).toDF("id", "text"))
    assert(idx.refresh() == 1L)
    assert(gramSet(idx) == Set("a b", "b c", "c d"))
    // rewrite keeps only doc 2: "a b" must leave; shared "b c" must stay
    src.overwrite(Seq((2L, "b c d")).toDF("id", "text"))
    assert(idx.refresh() >= 1L)
    assert(gramSet(idx) == Set("b c", "c d"))
  }

  test("contaminatedIds against the index matches batch Decontaminate on the same benchmark") {
    val root = Files.createTempDirectory("incdecon_chk_").toString
    val bench = Seq((1L, "needle one two three")).toDF("id", "text")
    val corpus = Seq(
      (10L, "clean text with no overlap at all"),
      (11L, "contains needle one two three inside"),
      (12L, "needle one two but not three consecutive")
    ).toDF("doc_id", "text")
    val src = VersionedTable(spark, s"$root/bench", collectStats = false)
    val idx = IncrementalDecontaminate(spark, src, s"$root/state", "text", n = 4)
    src.append(bench)
    idx.refresh()
    val inc = idx.contaminatedIds(corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val batch = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", 4)
      .collect().map(_.getLong(0)).toSet
    assert(inc == batch && inc == Set(11L))
    // clean() removes exactly those
    assert(idx.clean(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L, 12L))
  }

  test("a mismatched gram size on reopen is refused loudly") {
    val root = Files.createTempDirectory("incdecon_param_").toString
    val src = VersionedTable(spark, s"$root/bench", collectStats = false)
    src.append(Seq((1L, "a b c d")).toDF("id", "text"))
    IncrementalDecontaminate(spark, src, s"$root/state", "text", n = 3).refresh()
    val wrong = IncrementalDecontaminate(spark, src, s"$root/state", "text", n = 4)
    val e = intercept[IllegalArgumentException] {
      wrong.contaminatedIds(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("built with n=3"))
  }
}
