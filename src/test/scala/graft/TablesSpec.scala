package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-table loader contract: every physical shape `events.ts`
  * has shipped in across driver testdata regenerations must canonicalize to
  * session-zoned TimestampType with identical instants. Round 6 broke
  * because a regeneration switched NANOS→NTZ-micros and the loader only
  * converted the long-nanos shape; this spec makes the next shape change a
  * red test instead of a silent ClassCastException downstream.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // one known instant, expressed per-shape below
  private val microsUtc = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def loadedTs(dir: String): (DataType, Long) = {
    val df = Tables(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val micros = df.select(unix_micros(col("ts"))).collect().head.getLong(0)
    (dt, micros)
  }

  test("all three historical events.ts shapes load as TimestampType with the same instant") {
    val base = java.nio.file.Files.createTempDirectory("tables-shapes").toString

    // shape 1: legacy TIMESTAMP(NANOS) — under nanosAsLong=true Spark reads
    // the column as LongType carrying nanos; a plain long column reproduces
    // exactly what the loader sees
    writeEvents(s"$base/nanos", lit(microsUtc * 1000L))
    // shape 2: TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType
    // (the round-6 regression shape)
    writeEvents(s"$base/ntz",
      lit(java.time.LocalDateTime.ofEpochSecond(
        microsUtc / 1000000L, ((microsUtc % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)))
    // shape 3: ordinary session-zoned micros (GenScale output)
    writeEvents(s"$base/ltz", timestamp_micros(lit(microsUtc)))

    for (shape <- Seq("nanos", "ntz", "ltz")) {
      val (dt, micros) = loadedTs(s"$base/$shape")
      assert(dt === TimestampType, s"shape $shape must canonicalize to TimestampType")
      assert(micros === microsUtc, s"shape $shape must preserve the instant")
    }
  }

  test("q17 boundary extraction is shape-agnostic on the live testdata") {
    // the exact call path that threw in round 6
    val out = Queries.q17RecentEvents(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
  }
}
