package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** k-anonymity / l-diversity audit and the minimal-generalization
  * lattice search.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // (segment, balance, sensitive) rows
  private def rows(rs: (String, Double, Int)*) =
    rs.toDF("seg", "bal", "s")

  test("kAnonymityClasses: class sizes and l-diversity at a fixed level") {
    val df = rows(("a", 10.0, 1), ("a", 11.0, 1), ("a", 12.0, 2),
      ("b", 10.0, 1), ("a", 100.0, 3))
    // level 4: bucket width 16 — balances 10..12 share bucket 0, 100 -> 6
    val out = Privacy.kAnonymityClasses(df, Seq("seg"), "bal", "s", 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(("a", 0L) -> (3L, 2L), ("b", 0L) -> (1L, 1L),
      ("a", 6L) -> (1L, 1L)))
  }

  test("negative balances generalize by floor division (sign-extending shift)") {
    val out = Privacy.kAnonymityClasses(
        rows(("a", -1.0, 1), ("a", -16.0, 2), ("a", -17.0, 3)),
        Seq("seg"), "bal", "s", 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // floor(-1)>>4 = -1, floor(-16)>>4 = -1, floor(-17)>>4 = -2
    assert(out == Map(-1L -> 2L, -2L -> 1L))
  }

  test("minimalGeneralization finds the least level satisfying (k, l)") {
    // 8 rows in one segment, balances 0..7, sensitive alternating —
    // level 0: classes of 1 (fails k=2); level 1: pairs {0,1}.. each
    // size 2 with 2 distinct sensitive values -> satisfied at level 1
    val df = rows((0 until 8).map(i => ("a", i.toDouble, i % 2)): _*)
    val (lvl, classes) = Privacy.minimalGeneralization(
      df, Seq("seg"), "bal", "s", k = 2, l = 2, maxLevel = 8)
    assert(lvl == 1)
    assert(classes.count() == 4)
    assert(classes.agg(min("class_size"), min("l_diversity"))
      .head() == org.apache.spark.sql.Row(2L, 2L))
  }

  test("minimalGeneralization returns -1 when even the coarsest level fails") {
    // a lone row in segment b can never reach k=2 by numeric coarsening
    val df = rows(("a", 1.0, 1), ("a", 2.0, 2), ("b", 1.0, 1))
    val (lvl, audit) = Privacy.minimalGeneralization(
      df, Seq("seg"), "bal", "s", k = 2, l = 1, maxLevel = 4)
    assert(lvl == -1)
    assert(audit.filter(col("class_size") < 2).count() == 1)
  }

  test("forgetSubject: cascade delete with verified audit; old versions resurrect until vacuum") {
    val r = java.nio.file.Files.createTempDirectory("privacy_forget").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((1L, "x"), (2L, "y"), (1L, "z")).toDF("uid", "v"))
    val tb = graft.storage.VersionedTable(spark, s"$r/b")
    tb.append(Seq((1L, 10.0), (3L, 30.0)).toDF("uid", "w"))
    val preVersion = ta.state.get.version
    val audit = graft.operators.Privacy.forgetSubject(
        Seq(ta -> "uid", tb -> "uid"), 1L)
      .collect().map(row => row.getString(0) ->
        (row.getLong(2), row.getLong(4))).toMap
    assert(audit(s"$r/a") == ((2L, 0L)) && audit(s"$r/b") == ((1L, 0L)))
    assert(ta.read.count() == 1 && tb.read.count() == 1)
    // the erasure gap the scaladoc warns about: time travel still holds
    // the subject until vacuum
    assert(ta.readVersion(preVersion).filter(col("uid") === 1).count() == 2)
    // vacuumNow variant reclaims immediately (fresh tables)
    val tc = graft.storage.VersionedTable(spark, s"$r/c")
    tc.append(Seq((1L, "x"), (2L, "y")).toDF("uid", "v"))
    val v0 = tc.state.get.version
    graft.operators.Privacy.forgetSubject(Seq(tc -> "uid"), 1L,
      vacuumNow = true)
    assert(tc.read.count() == 1)
    assert(intercept[Exception](tc.readVersion(v0).count()) != null)
  }

  test("forgetSubject: journaled cascade killed between tables resumes exactly once") {
    val r = java.nio.file.Files.createTempDirectory("privacy_resume").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((1L, "x"), (2L, "y"), (1L, "z")).toDF("uid", "v"))
    val tb = graft.storage.VersionedTable(spark, s"$r/b")
    tb.append(Seq((1L, 10.0), (3L, 30.0)).toDF("uid", "w"))
    val jd = s"$r/journal"
    // "crash" after table a commits: the first attempt only ever reaches
    // table a (a one-table cascade against the same journal)
    val first = graft.operators.Privacy.forgetSubject(
      Seq(ta -> "uid"), 1L, journalDir = Some(jd)).head()
    assert(first.getLong(2) == 2L && !first.getBoolean(6)) // fresh, not resumed
    assert(tb.read.filter(col("uid") === 1).count() == 1) // cascade half-applied
    // re-run the FULL cascade: table a replays from the journal (original
    // count, resumed=true, no new commit), table b completes fresh
    val vA = ta.state.get.version
    val audit = graft.operators.Privacy.forgetSubject(
        Seq(ta -> "uid", tb -> "uid"), 1L, journalDir = Some(jd))
      .collect().map(row => row.getString(0) ->
        (row.getLong(2), row.getLong(4), row.getBoolean(6))).toMap
    assert(audit(s"$r/a") == ((2L, 0L, true)))
    assert(audit(s"$r/b") == ((1L, 0L, false)))
    assert(ta.state.get.version == vA) // replay, not re-delete
    assert(tb.read.filter(col("uid") === 1).count() == 0)
  }

  test("forgetSubject: crash between a table's delete commit and its done record") {
    val r = java.nio.file.Files.createTempDirectory("privacy_crash2").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((1L, "x"), (2L, "y"), (1L, "z")).toDF("uid", "v"))
    val jd = s"$r/journal"
    graft.operators.Privacy.forgetSubject(
      Seq(ta -> "uid"), 1L, journalDir = Some(jd))
    // simulate the crash window: the delete committed (live count is 0)
    // but the done record was lost
    val doneFiles = new java.io.File(jd).listFiles()
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".done"))
    assert(doneFiles.length == 1)
    doneFiles.foreach(_.delete())
    val replay = graft.operators.Privacy.forgetSubject(
      Seq(ta -> "uid"), 1L, journalDir = Some(jd)).head()
    // the live table has 0 subject rows, yet the audit still reports the
    // ORIGINAL 2 deleted rows — reconstructed from the journaled intent
    assert(replay.getLong(2) == 2L && replay.getLong(4) == 0L)
  }

  test("forgetSubject: journal rejects a resume with a different table list") {
    val r = java.nio.file.Files.createTempDirectory("privacy_mismatch").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((1L, "x")).toDF("uid", "v"))
    val tb = graft.storage.VersionedTable(spark, s"$r/b")
    tb.append(Seq((1L, 1.0)).toDF("uid", "w"))
    val jd = s"$r/journal"
    graft.operators.Privacy.forgetSubject(
      Seq(ta -> "uid"), 1L, journalDir = Some(jd))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Privacy.forgetSubject(
        Seq(tb -> "uid"), 1L, journalDir = Some(jd))
    }
    assert(e.getMessage.contains("table lists must match"))
  }

  test("forgetSubject audit carries the vacuumed flag") {
    val r = java.nio.file.Files.createTempDirectory("privacy_vacflag").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((1L, "x"), (2L, "y")).toDF("uid", "v"))
    val noVac = graft.operators.Privacy.forgetSubject(Seq(ta -> "uid"), 1L)
      .head()
    assert(!noVac.getBoolean(5)) // the subject is still time-travel-recoverable
    val tb = graft.storage.VersionedTable(spark, s"$r/b")
    tb.append(Seq((1L, "x"), (2L, "y")).toDF("uid", "v"))
    val vac = graft.operators.Privacy.forgetSubject(Seq(tb -> "uid"), 1L,
      vacuumNow = true).head()
    assert(vac.getBoolean(5))
  }

  test("forgetSubject: absent subject is a clean zero-row audit, no commit") {
    val r = java.nio.file.Files.createTempDirectory("privacy_noop").toString
    val ta = graft.storage.VersionedTable(spark, s"$r/a")
    ta.append(Seq((2L, "y")).toDF("uid", "v"))
    val v = ta.state.get.version
    val a = graft.operators.Privacy.forgetSubject(Seq(ta -> "uid"), 1L)
      .head()
    assert(a.getLong(2) == 0L && a.getLong(4) == 0L)
    // zone maps prove the no-op: version unchanged
    assert(ta.state.get.version == v)
  }

  test("NULL QI or sensitive rows are excluded from classes") {
    val df = Seq(("a", Some(1.0), Some(1)), ("a", None, Some(1)),
      (null, Some(1.0), Some(1)), ("a", Some(1.5), None))
      .toDF("seg", "bal", "s")
    val out = Privacy.kAnonymityClasses(df, Seq("seg"), "bal", "s", 0)
    assert(out.agg(sum("class_size")).head().getLong(0) == 1L)
  }
}
