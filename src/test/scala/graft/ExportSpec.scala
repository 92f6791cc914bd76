package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Export

/** Sharded export hand-off: layout, determinism, verification. */
class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def corpus = (0 until 500)
    .map(i => (i.toLong, s"document body number $i " * (1 + i % 5)))
    .toDF("doc_id", "text")

  test("export writes one directory per shard; verify matches write-side") {
    val out = java.nio.file.Files.createTempDirectory("exp1").toString
    val m = Export.shardedExport(corpus, "doc_id", "text", 7L, 4, out)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m.keySet == Set(0L, 1L, 2L, 3L))
    assert(m.values.map(_._1).sum == 500)
    // every shard directory exists on disk
    val dirs = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("shard=0", "shard=1", "shard=2", "shard=3"), dirs)
    // loader-side recompute equals the write-side manifest
    val v = Export.verify(spark, out, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(v == m)
  }

  test("assignment is id-pure: re-export and input reorder never move a row") {
    val out1 = java.nio.file.Files.createTempDirectory("exp2").toString
    val out2 = java.nio.file.Files.createTempDirectory("exp3").toString
    val m1 = Export.shardedExport(corpus, "doc_id", "text", 7L, 4, out1)
      .collect().toSet
    val m2 = Export.shardedExport(
        corpus.orderBy(rand(99)).repartition(13), "doc_id", "text", 7L, 4, out2)
      .collect().toSet
    assert(m1 == m2)
    // per-row check: the same doc lands in the same shard in both exports
    val a = spark.read.parquet(out1).select("doc_id", "shard")
    val b = spark.read.parquet(out2).select("doc_id", "shard")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("verification catches a corrupted shard") {
    val out = java.nio.file.Files.createTempDirectory("exp4").toString
    val m = Export.shardedExport(corpus, "doc_id", "text", 7L, 4, out)
      .collect().toSet
    // drop one shard directory wholesale (a lost/partial copy)
    val victim = new java.io.File(out, "shard=2")
    victim.listFiles.foreach(_.delete()); victim.delete()
    val v = Export.verify(spark, out, "text").collect().toSet
    assert(v != m && v.size == 3)
  }

  test("manifest checksum is a true sum-mod-prime (reduced, overflow-safe)") {
    // one shard of 500 rows: an UNREDUCED sum of ~5e8-sized terms would be
    // ~2.5e11 >> the prime, so < prime pins the aggregate-level reduction
    val out = java.nio.file.Files.createTempDirectory("exp6").toString
    val m = Export.shardedExport(corpus, "doc_id", "text", 7L, 1, out).collect()
    assert(m.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 1000000007L))
  }

  test("a shard's files are written by one partition (no small files)") {
    val out = java.nio.file.Files.createTempDirectory("exp5").toString
    Export.shardedExport(corpus.repartition(32), "doc_id", "text", 7L, 4, out)
    val filesPerShard = new java.io.File(out).listFiles
      .filter(_.isDirectory)
      .map(d => d.getName -> d.listFiles.count(_.getName.endsWith(".parquet")))
      .toMap
    assert(filesPerShard.values.forall(_ == 1), filesPerShard.toString)
  }
}
