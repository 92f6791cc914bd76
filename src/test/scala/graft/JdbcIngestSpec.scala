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

  test("first pull with parts>1 fans out via a server-side MIN lower bound") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(rows(0, 399), "src", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src", "id", t, parts = 4) == 400L)
    assert(t.read.count() == 400)
    assert(t.offsets(JdbcIngest.streamId("src", "id")) == 399L)
  }

  test("DATE watermark: delta pulls, epoch-day offset encoding, replay no-op") {
    val wh = freshWh(); val t = freshTarget()
    def days(lo: Int, hi: Int) = (lo to hi)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i)), s"d$i")).toDF("d", "name")
    wh.writeTable(days(0, 9), "src_d", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src_d", "d", t) == 10L)
    val expect0 = java.time.LocalDate.of(2020, 1, 10).toEpochDay
    assert(t.offsets(JdbcIngest.streamId("src_d", "d")) == expect0)
    // replay: nothing new
    assert(JdbcIngest.pull(wh, "src_d", "d", t) == 0L)
    // growth: only the new dates transfer; partitioned pull agrees
    wh.writeTable(days(10, 39), "src_d", SaveMode.Append)
    assert(JdbcIngest.pull(wh, "src_d", "d", t, parts = 3) == 30L)
    assert(t.read.count() == 40)
    assert(t.read.select(max(col("d"))).head().getDate(0).toLocalDate ==
      java.time.LocalDate.of(2020, 2, 9))
  }

  test("TIMESTAMP watermark: epoch-micros encoding, sub-second boundaries exact") {
    val wh = freshWh(); val t = freshTarget()
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val first = Seq((ts(1000L), "a"), (ts(2500L), "b"), (ts(2501L), "c"))
      .toDF("at", "name")
    wh.writeTable(first, "src_t", SaveMode.Overwrite)
    assert(JdbcIngest.pull(wh, "src_t", "at", t) == 3L)
    assert(t.offsets(JdbcIngest.streamId("src_t", "at")) == 2501000L) // micros
    // a 1ms-later row is strictly above the watermark; an equal one is not
    wh.writeTable(Seq((ts(2501L), "dup"), (ts(2502L), "d")).toDF("at", "name"),
      "src_t", SaveMode.Append)
    assert(JdbcIngest.pull(wh, "src_t", "at", t) == 1L)
    assert(t.read.count() == 4)
    assert(!t.read.select("name").as[String].collect().contains("dup"))
  }

  test("TIMESTAMP_NTZ watermark: NTZ type survives the pull; parts>1 fans out via slice predicates") {
    // zone-free profile: Derby TIMESTAMP reads back as TIMESTAMP_NTZ
    val db = "memory:graft_ntz_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val wh = new JdbcWarehouse(spark, JdbcProfile(
      url = s"jdbc:derby:$db;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"),
      preferTimestampNTZ = true))
    val t = freshTarget()
    def ldt(i: Int) = java.time.LocalDateTime.of(2021, 1, 1, 0, 0, 0)
      .plusMinutes(i.toLong)
    def batch(lo: Int, hi: Int) = (lo to hi).map(i => (ldt(i), s"r$i"))
      .toDF("at", "name")
    wh.writeTable(batch(0, 99), "src_n", SaveMode.Overwrite)
    // first pull, parts=4: TIMESTAMP_NTZ is not stride-partitionable —
    // must fan out via disjoint slice predicates and still land ALL rows
    // including the MIN (slice 0 is lower-open on first pull)
    assert(JdbcIngest.pull(wh, "src_n", "at", t, parts = 4) == 100L)
    assert(t.read.schema("at").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(t.read.count() == 100)
    // delta pull with parts>1: lower-bounded slices, no double-ingest
    wh.writeTable(batch(100, 159), "src_n", SaveMode.Append)
    assert(JdbcIngest.pull(wh, "src_n", "at", t, parts = 3) == 60L)
    assert(t.read.count() == 160)
    assert(t.read.select(min(col("at")), max(col("at"))).head() ==
      org.apache.spark.sql.Row(ldt(0), ldt(159)))
    // replay no-op
    assert(JdbcIngest.pull(wh, "src_n", "at", t, parts = 3) == 0L)
  }

  test("fractional numeric watermark fails loud (truncation would skip rows)") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(Seq((2.5, "a"), (1.0, "b")).toDF("v", "name"), "src_f",
      SaveMode.Overwrite, columnTypes = Some("v DECIMAL(10,2)"))
    val e = intercept[Exception](JdbcIngest.pull(wh, "src_f", "v", t))
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => y.getMessage +: msgs(y.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("non-integral numeric")), e)
    // integral-valued decimals are fine (exact long conversion)
    val t2 = freshTarget()
    wh.writeTable(Seq((3.0, "c"), (1.0, "d")).toDF("v", "name"), "src_g",
      SaveMode.Overwrite, columnTypes = Some("v DECIMAL(10,2)"))
    assert(JdbcIngest.pull(wh, "src_g", "v", t2) == 2L)
    assert(t2.offsets(JdbcIngest.streamId("src_g", "v")) == 3L)
  }

  test("non-orderable watermark type fails loud") {
    val wh = freshWh(); val t = freshTarget()
    wh.writeTable(Seq(("x", 1L)).toDF("s", "v"), "src_s", SaveMode.Overwrite,
      columnTypes = Some("s VARCHAR(16)")) // Derby's CLOB default can't MAX
    val e = intercept[Exception](JdbcIngest.pull(wh, "src_s", "s", t))
    // Spark may wrap the codec error; the root message must be ours
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("unsupported watermark type")), e)
  }

  test("watermark predicate reaches the remote scan in the delta read") {
    val wh = freshWh()
    wh.writeTable(rows(0, 50), "src", SaveMode.Overwrite)
    val delta = wh.readIncremental("src", "id", 20L)
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,20)"), plan)
  }
}
