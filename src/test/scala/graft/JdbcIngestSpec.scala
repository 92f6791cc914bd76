package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JdbcIngest, JdbcProfile, JdbcWarehouse}
import graft.storage.VersionedTable

/** Incremental JDBC → versioned-table ingestion: delta-only pulls,
  * watermark-in-commit exactly-once, partitioned delta reads.
  */
class JdbcIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshWh(): JdbcWarehouse = {
    val db = "memory:graft_ing_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    new JdbcWarehouse(spark, JdbcProfile(
      url = s"jdbc:derby:$db;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver")))
  }

  private def freshTarget(): VersionedTable = VersionedTable(spark,
    java.nio.file.Files.createTempDirectory("jdbc_ingest").toString)

  private def rows(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"r$i", i * 1.5)).toDF("id", "name", "v")

  test("first pull ingests everything and records the watermark") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(rows(0, 9), "src", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src", "id", t) == 10L)
    assert(t.read.count() == 10)
    assert(t.offsets(JdbcIngest.streamId("src", "id")) == 9L)
  }

  test("subsequent pulls move only the delta; no-change pull commits nothing") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(rows(0, 9), "src", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src", "id", t) == 10L)
    val v1 = t.state.map(_.version)
    // nothing new: zero rows, zero commits
    assert(JdbcIngest.pull(wh, "src", "id", t) == 0L)
    assert(t.state.map(_.version) == v1)
    // source grows; only the new window transfers
    wh.writeTable(rows(10, 24), "src", SaveMode.Append)
    assert(JdbcIngest.pull(wh, "src", "id", t) == 15L)
    assert(t.read.count() == 25)
    assert(t.offsets(JdbcIngest.streamId("src", "id")) == 24L)
    // target contents equal the source exactly
    assert(t.read.as[(Long, String, Double)].collect().toSet ==
      rows(0, 24).as[(Long, String, Double)].collect().toSet)
  }

  test("a pull whose window already committed is a no-op (exactly-once)") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(rows(0, 9), "src", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src", "id", t) == 10L)
    // simulate a replayed coordinator that lost its memory of the commit:
    // the recorded offset already covers the window, so nothing lands
    assert(JdbcIngest.pull(wh, "src", "id", t) == 0L)
    assert(t.read.count() == 10)
  }

  test("partitioned delta pull (parts=4) matches the serial result") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(rows(0, 10), "src", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src", "id", t) == 11L)
    wh.writeTable(rows(11, 400), "src", SaveMode.Append)
    assert(JdbcIngest.pull(wh, "src", "id", t, parts = 4) == 390L)
    assert(t.read.count() == 401)
    assert(t.read.agg(sum("id")).as[Long].head() == (0L to 400L).sum)
  }

  test("watermark predicate reaches the remote scan in the delta read") {
    val wh = freshWh()
    wh.writeTable(rows(0, 50), "src", SaveMode.Overwrite)
    val delta = wh.readIncremental("src", "id", 20L)
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,20)"), plan)
  }
}
