package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val rows = Seq(
    // (id, qty, flag, status, price, fk)
    (Some(1L), Some(5.0), "R", "O", 10.0, Some(1L)),
    (Some(2L), Some(60.0), "X", "F", -1.0, Some(2L)),   // qty + flag + price bad
    (None: Option[Long], None: Option[Double], null, "Q", 3.0, Some(99L)), // nulls + status + orphan
    (Some(1L), Some(7.0), "A", "O", 4.0, None)          // dup id; null fk is NOT an orphan
  ).toDF("id", "qty", "flag", "status", "price", "fk")
  private lazy val dim = Seq(1L, 2L, 3L).toDF("k")

  test("every rule type counts its violations exactly; report preserves rule order") {
    val rules = Seq(
      NotNull("id"), InRange("qty", 1.0, 50.0), OneOf("flag", Seq("R", "A", "N")),
      Matches("status", "[OF]"), Satisfies("price_positive", col("price") > 0.0),
      Unique(Seq("id")), RefIntegrity("fk", dim, "k"))
    val got = Expectations.audit(rows, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(_._1).toSeq == rules.map(_.name))
    val m = got.map(t => t._1 -> t).toMap
    assert(m("not_null:id") == (("not_null:id", 4L, 1L, false)))
    assert(m("in_range:qty") == (("in_range:qty", 4L, 2L, false)))   // 60.0 + null
    assert(m("one_of:flag") == (("one_of:flag", 4L, 2L, false)))     // X + null
    assert(m("matches:status") == (("matches:status", 4L, 1L, false))) // Q
    assert(m("satisfies:price_positive")._3 == 1L)                   // -1.0
    assert(m("unique:id") == (("unique:id", 4L, 1L, false)))         // one extra copy of id=1
    assert(m("ref:fk") == (("ref:fk", 4L, 1L, false)))               // fk=99; null fk exempt
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "qty")
    val rep = Expectations.audit(clean,
      Seq(NotNull("id"), InRange("qty", 1.0, 50.0), Unique(Seq("id"))))
    assert(rep.filter(!col("passed")).count() == 0)
    assert(rep.agg(sum("n_violations")).head.getLong(0) == 0L)
  }

  test("scalar rules evaluate in ONE aggregate pass (no shuffle in the scalar plan)") {
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val scalarAgg = df.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity").isNull ||
        col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("v"))
    val p = scalarAgg.queryExecution.executedPlan.toString
    // global single-row agg: partial + final, exactly one exchange
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("fkOrphans: orphans, null keys and clean relations audit separately") {
    import graft.operators.Expectations
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(99L),
      Some(77L), None).toDF("fk")
    val r = Expectations.fkOrphans(child, Seq("fk"), parent, Seq("pk"),
      "child->parent").head()
    assert(r.getString(0) == "child->parent")
    assert(r.getLong(1) == 7L) // n_child_rows
    assert(r.getLong(2) == 1L) // n_null_keys (NULL is absent, not dangling)
    assert(r.getLong(3) == 3L) // n_orphans (99, 99, 77)
    assert(r.getLong(4) == 2L) // n_orphan_keys (99, 77)
    val clean = Expectations.fkOrphans(parent, Seq("pk"), parent, Seq("pk"),
      "self").head()
    assert(clean.getLong(3) == 0L && clean.getLong(4) == 0L)
  }
}
