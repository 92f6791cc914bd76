package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the benchmark tables at /root/testdata/sf*.
  *
  * `events.ts` has shipped in three physical shapes across driver testdata
  * regenerations: TIMESTAMP(NANOS) (read as a long under the legacy conf),
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TimestampNTZType), and
  * plain TIMESTAMP_LTZ micros. The loader canonicalizes ALL of them to
  * session-zoned TimestampType so every consumer sees one type regardless of
  * which shape the current files carry. The session timezone is pinned UTC
  * (GraftSession), so NTZ→LTZ is instant-preserving and DuckDB — which reads
  * the same file with `CAST(ts AS TIMESTAMP)` semantics — stays aligned.
  * Nanos are truncated with integer division (ts ~1.7e18 — a double
  * round-trip would lose precision); DuckDB truncates the same way.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // needs spark.sql.legacy.parquet.nanosAsLong=true, set once at
        // session build (GraftSession) — a loader must not mutate session
        // conf as a side effect. The driver's files carry TIMESTAMP(NANOS)
        // (read as long under the legacy conf); scaled-out copies
        // (GenScale) are written as ordinary micro timestamps — branch on
        // the read schema so both shapes load identically.
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      case n =>
        spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
