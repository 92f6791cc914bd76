package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd

/** SCD Type 2 contracts: history chains across batches, no-op updates
  * create no versions, new keys insert open-ended, per-key invariants
  * (one current row, contiguous non-overlapping validity ranges).
  */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def dim0 = Seq(
    (1L, "A", "2020-01-01"), (2L, "B", "2020-01-01"), (3L, "C", "2020-01-01")
  ).toDF("k", "seg", "vf")
    .select(col("k"), col("seg"), col("vf").cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))

  test("two-batch history chain: close, reopen, and re-close correctly") {
    val b1 = Seq((1L, "A2"), (4L, "D")).toDF("k", "seg")
    val d1 = Scd.applyBatch(dim0, b1, "k", Seq("seg"), lit("2020-06-01"))
    val b2 = Seq((1L, "A3"), (2L, "B2")).toDF("k", "seg")
    val d2 = Scd.applyBatch(d1, b2, "k", Seq("seg"), lit("2021-01-01"))
      .select("k", "seg", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3)),
        r.getBoolean(4))).toSet
    assert(d2 == Set(
      (1L, "A",  "2020-01-01", "2020-06-01", false),
      (1L, "A2", "2020-06-01", "2021-01-01", false),
      (1L, "A3", "2021-01-01", "null",       true),
      (2L, "B",  "2020-01-01", "2021-01-01", false),
      (2L, "B2", "2021-01-01", "null",       true),
      (3L, "C",  "2020-01-01", "null",       true),
      (4L, "D",  "2020-06-01", "null",       true)))
  }

  test("no-op update (unchanged tracked value) creates no version") {
    val b = Seq((2L, "B")).toDF("k", "seg")
    val d = Scd.applyBatch(dim0, b, "k", Seq("seg"), lit("2020-06-01"))
    assert(d.count() == 3)
    assert(d.filter(col("k") === 2L && col("is_current") &&
      col("valid_to").isNull).count() == 1)
  }

  test("per-key invariants hold on the q98 catalog query at sf0.001") {
    val out = Queries.q98Scd2(spark, "/root/testdata/sf0.001").cache()
    try {
      // exactly one current row per key, and it is open-ended
      val bad = out.groupBy("k").agg(
        sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
        sum(when(col("is_current") && col("valid_to").isNotNull, 1)
          .otherwise(0)).as("open_violation"))
        .filter(col("n_cur") =!= 1 || col("open_violation") =!= 0)
      assert(bad.isEmpty)
      // closed rows chain exactly into their successor's valid_from
      val closed = out.filter(!col("is_current"))
        .select(col("k"), col("valid_to").as("vt"))
      val opened = out.filter(col("is_current"))
        .select(col("k"), col("valid_from").as("vf"))
      assert(closed.join(opened, "k")
        .filter(col("vt") =!= col("vf")).isEmpty)
      // a no-op-updated key (k % 13, not % 7, not changed) stays single-version
      assert(out.filter(col("k") === 13L).count() ==
        (if (out.filter(col("k") === 13L).isEmpty) 0 else 1))
    } finally out.unpersist()
  }
}
