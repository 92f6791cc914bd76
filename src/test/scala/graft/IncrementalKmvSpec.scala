package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalKmv, Sketches}
import graft.storage.VersionedTable

/** Incremental KMV: delta-maintained sketches must equal the from-scratch
  * batch sketches EXACTLY (same min-sets, not just close estimates).
  */
class IncrementalKmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("multi-batch refresh equals from-scratch sketches; estimates compose") {
    val root = java.nio.file.Files.createTempDirectory("inc_kmv").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val kmv = IncrementalKmv(spark, src, s"$root/state", "g", "v", k = 64)

    val batch1 = (1L to 2000L).map(v => ("a", v)) ++ (1500L to 3000L).map(v => ("b", v))
    val batch2 = (2001L to 2500L).map(v => ("a", v)) ++ (1L to 50L).map(v => ("c", v))
    src.append(batch1.toDF("g", "v"))
    assert(kmv.refresh() == 1L)
    src.append(batch2.toDF("g", "v"))
    assert(kmv.refresh() == 1L)
    assert(kmv.refresh() == 0L)

    val scratch = Sketches.kmvByGroup(
      (batch1 ++ batch2).toDF("g", "v"), "g", "v", 64)
    val inc = kmv.sketches
    assert(inc.keySet == scratch.keySet)
    inc.foreach { case (g, sk) =>
      assert(sk.mins.toSeq == scratch(g).mins.toSeq, s"group $g min-set drift")
    }
    // small group is exact; estimates within the envelope for big ones
    assert(inc("c").isExact && inc("c").estimate == 50.0)
    assert(math.abs(inc("a").estimate - 2500) < 2500 * 0.7)
    // overlap estimate composes from maintained state
    val interAB = inc("a").intersectEstimate(inc("b"))
    assert(interAB >= 0.0)
  }

  test("DELETE rows in the source delta are refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("inc_kmv_del").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val kmv = IncrementalKmv(spark, src, s"$root/state", "g", "v", k = 16)
    src.append(Seq(("a", 1L), ("a", 2L)).toDF("g", "v"))
    assert(kmv.refresh() == 1L)
    src.deleteWhere(col("v") === 1L)
    val e = intercept[IllegalArgumentException](kmv.refresh())
    assert(e.getMessage.contains("append-only"))
  }

  test("maxGroups violation fails WITHOUT committing state or consuming offset") {
    val root = java.nio.file.Files.createTempDirectory("inc_kmv_max").toString
    val src = VersionedTable(spark, s"$root/src", collectStats = false)
    val kmv = IncrementalKmv(spark, src, s"$root/state", "g", "v", k = 16,
      maxGroups = 2)
    src.append(Seq(("a", 1L), ("b", 2L)).toDF("g", "v"))
    assert(kmv.refresh() == 1L)
    val before = kmv.sketches
    // third group exceeds maxGroups=2 — the refresh must throw and leave
    // the durable state exactly as it was (same groups, same offset), so
    // a later retry still sees the violating delta instead of skipping it
    src.append(Seq(("c", 3L)).toDF("g", "v"))
    val e = intercept[IllegalArgumentException](kmv.refresh())
    assert(e.getMessage.contains("maxGroups"))
    assert(kmv.sketches.keySet == before.keySet)
    val e2 = intercept[IllegalArgumentException](kmv.refresh())
    assert(e2.getMessage.contains("maxGroups"), "offset was consumed")
  }
}
