package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IncrementalComponents}
import graft.storage.VersionedTable

/** Incremental CC: delta-driven refreshes must equal the from-scratch
  * star contraction after every batch, including cross-batch component
  * merges; deletes are refused loudly.
  */
class IncrementalComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("multi-batch refresh equals from-scratch; cross-batch merges resolve") {
    val root = java.nio.file.Files.createTempDirectory("inc_cc").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val cc = IncrementalComponents(spark, src, s"$root/state")

    // batch 1: two separate components + a chain
    src.append(Seq((1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b"))
    assert(cc.refresh() == 1L)
    val l1 = labelsOf(cc.read)
    assert(l1(2L) == 1L && l1(11L) == 10L && l1(22L) == 20L)

    // batch 2: MERGE components {1,2} and {10,11} via a bridging edge,
    // add a fresh pair; {20,21,22} untouched
    src.append(Seq((2L, 10L), (30L, 31L)).toDF("id_a", "id_b"))
    assert(cc.refresh() == 1L)
    val l2 = labelsOf(cc.read)
    assert(l2(10L) == 1L && l2(11L) == 1L && l2(2L) == 1L)
    assert(l2(31L) == 30L)
    assert(l2(22L) == 20L, "untouched component must survive bucket rewrite")

    // batch 3: equality with from-scratch on a random graph overlay
    val rng = new scala.util.Random(7)
    val rand = (1 to 60).map(_ => (100L + rng.nextInt(40), 100L + rng.nextInt(40)))
    src.append(rand.toDF("id_a", "id_b"))
    assert(cc.refresh() == 1L)
    val all = Seq((1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L),
      (2L, 10L), (30L, 31L)) ++ rand
    val scratch = labelsOf(Dedup.starComponents(all.toDF("id_a", "id_b")))
    assert(labelsOf(cc.read) == scratch)

    // already current
    assert(cc.refresh() == 0L)
  }

  test("DELETE rows in the source delta are refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("inc_cc_del").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val cc = IncrementalComponents(spark, src, s"$root/state")
    src.append(Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    assert(cc.refresh() == 1L)
    src.deleteWhere(col("id_a") === 3L)
    val e = intercept[IllegalArgumentException](cc.refresh())
    assert(e.getMessage.contains("append-only"))
  }
}
