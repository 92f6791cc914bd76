package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.storage.VersionedTable
import graft.changefeed.ChangeFeed
import graft.operators.{MergeInto, OrderedLag}
import java.nio.file.Files

class StorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_test_").toString

  test("VersionedTable: overwrite/append/read with commit log") {
    val t = VersionedTable(spark, tmp() + "/t1")
    assert(!t.exists)
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(t.read.count() == 2)
    t.append(Seq((3, "c")).toDF("k", "v"))
    assert(t.read.count() == 3)
    t.overwrite(Seq((9, "z")).toDF("k", "v"))
    assert(t.read.count() == 1)
    assert(t.state.get.version == 3)
  }

  test("VersionedTable: offsets persist and merge atomically with commit") {
    val t = VersionedTable(spark, tmp() + "/t2")
    t.overwrite(Seq(1).toDF("x"), Map("feedA" -> 5L))
    t.append(Seq(2).toDF("x"), Map("feedB" -> 1L))
    assert(t.offsets == Map("feedA" -> 5L, "feedB" -> 1L))
    t.append(Seq(3).toDF("x"), Map("feedA" -> 6L))
    assert(t.offsets == Map("feedA" -> 6L, "feedB" -> 1L))
  }

  test("ChangeFeed: publish/pending/hasData with metadata columns") {
    val f = ChangeFeed(spark, "S", tmp() + "/feed")
    assert(!f.hasData(0))
    val b1 = f.publish(Seq((1, 10.0)).toDF("k", "v"))
    val b2 = f.publish(Seq((2, 20.0)).toDF("k", "v"))
    assert(b1 == 1 && b2 == 2)
    assert(f.hasData(0) && f.hasData(1) && !f.hasData(2))
    val p = f.pending(1)
    assert(p.count() == 1)
    val row = p.collect().head
    assert(row.getAs[String](ChangeFeed.ACTION) == "INSERT")
    assert(!row.getAs[Boolean](ChangeFeed.IS_UPDATE))
    assert(row.getAs[String](ChangeFeed.ROW_ID).nonEmpty)
    assert(f.pending(0).count() == 2)
  }

  test("MergeInto: insert-only bootstrap, then matched update + unmatched insert") {
    val t = VersionedTable(spark, tmp() + "/m1")
    val r1 = MergeInto(spark, t,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(r1.inserted == 2 && r1.updated == 0)

    val r2 = MergeInto(spark, t,
      Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(r2.updated == 1 && r2.inserted == 1)
    val m = t.read.as[(Int, String)].collect().toMap
    assert(m == Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("MergeInto: duplicate source keys raise without dedupeSource") {
    val t = VersionedTable(spark, tmp() + "/m2")
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      MergeInto(spark, t, Seq((1, "x"), (1, "y")).toDF("k", "v"), Seq("k"))
    }
    val r = MergeInto(spark, t, Seq((1, "x"), (1, "y")).toDF("k", "v"),
      Seq("k"), dedupeSource = true)
    assert(r.updated == 1)
    assert(t.read.as[(Int, String)].collect().toMap == Map(1 -> "y"))
  }

  test("MergeInto: idempotent re-merge of identical source") {
    val t = VersionedTable(spark, tmp() + "/m3")
    val src = Seq((1, 1.5), (2, 2.5)).toDF("k", "v")
    MergeInto(spark, t, src, Seq("k"))
    val r = MergeInto(spark, t, src, Seq("k"))
    assert(r.updated == 2 && r.inserted == 0)
    assert(t.read.count() == 2)
  }

  test("MergeInto commits consumed offsets with the data") {
    val t = VersionedTable(spark, tmp() + "/m4")
    MergeInto(spark, t, Seq((1, "a")).toDF("k", "v"), Seq("k"),
      consumeOffsets = Map("S" -> 7L))
    assert(t.offsets("S") == 7L)
  }

  test("commit claim is atomic: double-create of a version file fails; losers don't corrupt") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vt_conflict").toString
    val t = graft.storage.VersionedTable(spark, root)
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the protocol's primitive: create(overwrite=false) succeeds exactly once
    val claim = new org.apache.hadoop.fs.Path(root, "_commits/00000002.json")
    val out = fs.create(claim, false)
    out.write("{\"version\":2,\"parts\":[\"v_00000001\"],\"offsets\":{}}".getBytes)
    out.close()
    intercept[java.io.IOException] { fs.create(claim, false).close() }
    // a writer that lost the race re-reads state and lands AFTER the winner,
    // never overwriting it — monotonic versions, consistent reads throughout
    val v = t.append(Seq((2, "b")).toDF("k", "v"))
    assert(v == 3L)
    assert(t.read.count() == 2) // winner's state (v2 = parts[v1]) + appended part
  }

  test("OrderedLag matches global-window lag exactly (incl. bucket boundaries)") {
    import org.apache.spark.sql.expressions.Window
    // dates spanning 3 years with gaps; a year entirely missing
    val days = Seq("2019-12-30", "2019-12-31", "2020-01-01", "2020-06-05",
      "2022-01-02", "2022-01-03").map(java.sql.Date.valueOf)
    val df = days.zipWithIndex.map { case (d, i) => (d, 100.0 + i) }
      .toDF("DATE", "V")
    val got = OrderedLag.byDate(df, "DATE", "V", "PREV")
      .orderBy("DATE").select("DATE", "PREV").collect().toSeq
    val want = df.withColumn("PREV", lag($"V", 1).over(Window.orderBy($"DATE")))
      .orderBy("DATE").select("DATE", "PREV").collect().toSeq
    assert(got == want)
  }
}
