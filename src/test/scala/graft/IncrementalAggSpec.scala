package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg
import graft.storage.VersionedTable

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("inc_agg_").toString

  private def scratch(src: VersionedTable) =
    src.read.groupBy("lang").agg(count(lit(1)).as("n_rows"),
      sum(col("tok")).as("sum_tok"))

  private def assertMatches(agg: IncrementalAgg, src: VersionedTable): Unit = {
    val got = agg.read.select("lang", "n_rows", "sum_tok")
      .as[(String, Long, Long)].collect().toSet
    val want = scratch(src).as[(String, Long, Long)].collect().toSet
    assert(got == want, s"materialized=$got vs scratch=$want")
  }

  test("refresh tracks appends, partition rewrites, and overwrites exactly") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, src, s"$root/agg",
      groupCols = Seq("lang"), sumCols = Seq("tok"))

    src.append(Seq(("en", 10L), ("en", 20L), ("de", 5L)).toDF("lang", "tok"))
    assert(agg.refresh() == 1L)
    assertMatches(agg, src)

    // pure appends: delta-only work
    src.append(Seq(("en", 1L), ("fr", 7L)).toDF("lang", "tok"))
    src.append(Seq(("fr", 3L)).toDF("lang", "tok"))
    assert(agg.refresh() == 2L)
    assertMatches(agg, src)

    // rewrite (update + delete): DELETE/INSERT delta merges exactly
    src.overwrite(Seq(("en", 100L), ("fr", 7L), ("fr", 3L)).toDF("lang", "tok"))
    agg.refresh()
    assertMatches(agg, src)
    // 'de' count fell to zero -> the group leaves the table
    assert(!agg.read.select("lang").as[String].collect().contains("de"))

    // idempotent when current; consumed version rides the commit
    assert(agg.refresh() == 0L)
    assert(agg.appliedVersion == src.state.get.version)
  }

  test("NULL group keys fold into one group across refreshes") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((null.asInstanceOf[String], 1L), ("en", 2L)).toDF("lang", "tok"))
    val agg = IncrementalAgg(spark, src, s"$root/agg", Seq("lang"), Seq("tok"))
    agg.refresh()
    src.append(Seq((null.asInstanceOf[String], 10L)).toDF("lang", "tok"))
    agg.refresh()
    val nullRow = agg.read.filter(col("lang").isNull)
      .select("n_rows", "sum_tok").as[(Long, Long)].collect()
    assert(nullRow.toSeq == Seq((2L, 11L)),
      s"null-keyed rows must stay ONE group: ${nullRow.toSeq}")
    assertMatches(agg, src)
  }

  test("refresh survives a schema-widening (ADD COLUMNS) commit inside the window") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq(("en", 1L), ("de", 2L)).toDF("lang", "tok"))
    val agg = IncrementalAgg(spark, src, s"$root/agg", Seq("lang"), Seq("tok"))
    agg.refresh()
    // widen the source, then REWRITE it with the new column — the delta
    // window (v1 -> v3) crosses a schema change on the exceptAll path,
    // which must align the old snapshot to the new schema, not crash
    src.addColumns(Seq(org.apache.spark.sql.types.StructField("src",
      org.apache.spark.sql.types.StringType)))
    src.overwrite(Seq(("en", 1L, null.asInstanceOf[String]),
      ("de", 2L, null.asInstanceOf[String]),
      ("en", 10L, "web")).toDF("lang", "tok", "src"))
    agg.refresh()
    assertMatches(agg, src)
    // the pre-existing rows carried NULL src on both sides of the diff,
    // so only the genuinely new row moved the aggregate
    assert(agg.read.filter(col("lang") === "en")
      .select("n_rows").as[Long].head() == 2L)
  }

  test("partition-scoped source rewrites refresh from the touched partition only") {
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.overwritePartitions(
      Seq(("en", 2020, 10L), ("de", 2020, 5L), ("en", 2021, 30L)).toDF("lang", "yr", "tok"), "yr")
    val agg = IncrementalAgg(spark, src, s"$root/agg", Seq("lang"), Seq("tok"))
    agg.refresh()
    assertMatches(agg, src)

    src.overwritePartitions(Seq(("en", 2021, 99L)).toDF("lang", "yr", "tok"), "yr")
    agg.refresh()
    assertMatches(agg, src)
    val en = agg.read.filter(col("lang") === "en")
      .select("n_rows", "sum_tok").as[(Long, Long)].head()
    assert(en == ((2L, 109L)), s"2020 row untouched + 2021 replaced: $en")
  }
}
