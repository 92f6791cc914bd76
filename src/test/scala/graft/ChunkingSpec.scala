package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Content-defined chunking: reconstruction, content-locality,
  * cross-document identity, edges.
  */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def chunks(text: String, avg: Int = 4): Seq[(Int, String)] =
    Seq(text).toDF("t")
      .select(explode(TextFunctions.chunkContentDefined(col("t"), avg)).as("c"))
      .select(col("c.chunk_id"), col("c.chunk"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq

  private val words =
    (0 until 200).map(i => s"w${i * 37 % 97}").mkString(" ")

  test("chunks reconstruct the token stream in order, ids consecutive") {
    val cs = chunks(words)
    assert(cs.map(_._1) == cs.indices.toSeq)
    assert(cs.map(_._2).mkString(" ") == words)
    assert(cs.length > 10, s"expected many ~4-token chunks, got ${cs.length}")
  }

  test("appending text never changes earlier chunks (content locality)") {
    val base = chunks(words)
    val more = chunks(words + " tail0 tail1 tail2")
    // all but the last base chunk must be identical
    assert(more.take(base.length - 1) == base.take(base.length - 1))
  }

  test("identical spans in different documents yield identical chunks") {
    val a = chunks("prefixA unique1 " + words).map(_._2).toSet
    val b = chunks("prefixB other2 " + words).map(_._2).toSet
    // the long shared span must produce many shared chunk strings
    assert((a intersect b).size > 10)
  }

  test("average chunk size tracks the divisor") {
    val n = words.split(" ").length
    val k4 = chunks(words, avg = 4).length
    val k32 = chunks(words, avg = 32).length
    assert(k4 > k32)
    assert(math.abs(n.toDouble / k4 - 4) < 4, s"avg ${n.toDouble / k4}")
  }

  test("relational CdcChunk.chunks equals the array form on a corpus") {
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 30 + i).map(j => s"t${(i * j) % 83}").mkString(" ")))
      .toDF("id", "text")
    val viaArray = docs.select(col("id"),
        explode(TextFunctions.chunkContentDefined(col("text"), 8)).as("c"))
      .select(col("id"), col("c.chunk_id"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    val viaRel = graft.operators.CdcChunk.chunks(docs, Seq("id"), "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getAs[String]("chunk")).toMap
    assert(viaRel == viaArray)
  }

  test("single-token, empty, and null texts behave") {
    assert(chunks("solo") == Seq((0, "solo")))
    assert(chunks("") == Seq.empty)
    val out = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.chunkContentDefined(col("t"), 4).as("c"))
      .collect()
    assert(out.head.getSeq[Any](0).isEmpty)
  }
}
