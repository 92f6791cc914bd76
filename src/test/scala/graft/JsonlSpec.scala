package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jsonl

/** JSONL source/sink: exact roundtrip of awkward text, corrupt-line
  * routing (never dropping, never failing).
  */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("roundtrip preserves newlines, quotes, unicode, and nulls exactly") {
    val rows = Seq(
      (1L, "line one\nline two\ttabbed"),
      (2L, "quotes \" and \\ backslashes"),
      (3L, "café 日本語 emoji 😀"),
      (4L, null)
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec").toString
    Jsonl.write(rows, dir)
    val back = Jsonl.valid(Jsonl.read(spark, dir, rows.schema))
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = rows.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("malformed lines are routed to the corrupt column, valid rows unharmed") {
    val rows = Seq((1L, "ok"), (2L, "also ok")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec2")
    Jsonl.write(rows, dir.toString)
    java.nio.file.Files.writeString(dir.resolve("bad.json"),
      "{\"id\": notanumber}\ngarbage line\n")
    val back = Jsonl.read(spark, dir.toString, rows.schema)
    // NOTE: a data column must ride along — Spark rejects json queries
    // that reference ONLY the corrupt column after pruning (the
    // documented source contract; see Jsonl.read scaladoc)
    val counts = back.agg(
      sum(when(col(Jsonl.CorruptCol).isNull, 1L).otherwise(0L)),
      sum(when(col(Jsonl.CorruptCol).isNotNull, 1L).otherwise(0L)),
      sum(col("id"))).head
    assert(counts.getLong(0) == 2L && counts.getLong(1) == 2L)
    assert(counts.getLong(2) == 3L)
    // a schema already carrying the corrupt column is rejected loudly
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, dir.toString,
        rows.schema.add(Jsonl.CorruptCol, org.apache.spark.sql.types.StringType))
    }
  }
}
