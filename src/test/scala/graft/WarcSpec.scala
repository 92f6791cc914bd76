package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC archive source/sink: record grammar, gzip members, HTTP split,
  * corrupt-record routing, roundtrip fidelity.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def corpus = (0 until 100)
    .map(i => (s"https://ex.am/p/$i", "text/plain",
      (s"body $i with unicode é中 " * (1 + i % 3)).getBytes(UTF_8)))
    .toDF("uri", "content_type", "payload")

  private def roundtrip(gzip: Boolean): Unit = {
    val out = java.nio.file.Files.createTempDirectory("warc1").toString
    Warc.write(corpus.repartition(3), out, gzip = gzip)
    val back = Warc.read(spark, out)
    assert(back.filter(col("warc_type") === "corrupt").count() == 0)
    assert(back.filter(col("warc_type") === "warcinfo").count() == 3)
    val resp = back.filter(col("warc_type") === "response")
    assert(resp.count() == 100)
    assert(resp.filter(col("http_status") =!= 200).count() == 0)
    // bodies byte-exact (unicode survives the gzip + HTTP split)
    val got = resp.select(col("target_uri"), col("body").cast("string"))
      .as[(String, String)].collect().toMap
    (0 until 100).foreach { i =>
      assert(got(s"https://ex.am/p/$i") ==
        s"body $i with unicode é中 " * (1 + i % 3))
    }
  }

  test("plain roundtrip is byte-exact")(roundtrip(gzip = false))
  test("member-gzip roundtrip is byte-exact")(roundtrip(gzip = true))

  test("record ids are id-pure: rewriting the same rows reproduces them") {
    val o1 = java.nio.file.Files.createTempDirectory("warc2").toString
    val o2 = java.nio.file.Files.createTempDirectory("warc3").toString
    Warc.write(corpus.repartition(2), o1)
    Warc.write(corpus.orderBy(rand(7)).repartition(5), o2)
    def ids(d: String) = Warc.read(spark, d)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("record_id"))
      .as[(String, String)].collect().toMap
    assert(ids(o1) == ids(o2))
  }

  test("re-writing into a populated dir replaces the old archives") {
    // pins overwrite semantics independent of the filesystem's rename-to-
    // existing behavior: HDFS rename returns false over an existing file,
    // so without driver-side dir prep a second write would silently keep
    // the STALE archives (local-FS rename overwrites, hiding the bug)
    val out = java.nio.file.Files.createTempDirectory("warc5").toString
    Warc.write(corpus.repartition(4), out)
    // also simulate an orphaned temp from a killed prior job
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-00000-999.inprogress"), "junk")
    val fresh = (0 until 5)
      .map(i => (s"https://ex.am/q/$i", "text/plain", s"new $i".getBytes(UTF_8)))
      .toDF("uri", "content_type", "payload")
    Warc.write(fresh.repartition(1), out)
    val back = Warc.read(spark, out).filter(col("warc_type") === "response")
    assert(back.count() == 5)
    assert(back.filter(col("target_uri").startsWith("https://ex.am/p/"))
      .count() == 0)
    assert(!new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".inprogress")))
  }

  test("a truncated record routes to one corrupt row, prior records survive") {
    val out = java.nio.file.Files.createTempDirectory("warc4").toString
    Warc.write(corpus.limit(5).coalesce(1), out, gzip = false)
    val f = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".warc")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // cut the final record's payload short and claim a bogus length
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)
    java.nio.file.Files.write(f.toPath, cut)
    // the out-of-band rewrite invalidates Hadoop's local-FS checksum
    // sidecar; drop it so the read sees the corruption, not the CRC
    new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val back = Warc.read(spark, out)
    val byType = back.groupBy(col("warc_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType("corrupt") == 1)
    assert(byType("response") == 4) // the 5th is the corrupt remainder
    assert(byType("warcinfo") == 1)
  }

  test("parser accepts foreign WARC bytes (not just its own writer)") {
    // hand-built record, LF-free headers, no HTTP wrapper
    val payload = "plain payload".getBytes(UTF_8)
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Record-ID: <urn:uuid:abc>\r\n" +
      "WARC-Target-URI: https://x/y\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
      payload ++ "\r\n\r\n".getBytes(UTF_8)
    val rows = Warc.parseAll("mem", rec).toSeq
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getString(1) == "resource")
    assert(r.getString(2) == "urn:uuid:abc")
    assert(r.getString(3) == "https://x/y")
    assert(r.getLong(5) == payload.length.toLong)
    assert(r.get(6) == null) // no HTTP status on a bare resource
    assert(new String(r.getAs[Array[Byte]](7), UTF_8) == "plain payload")
  }
}
