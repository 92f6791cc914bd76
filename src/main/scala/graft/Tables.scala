package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the benchmark tables at /root/testdata/sf*.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 rejects
  * outright; we read it as a long (legacy conf) and convert to a microsecond
  * timestamp with integer division (ts is ~1.7e18 — a double round-trip
  * would lose precision). DuckDB truncates the same way on
  * `CAST(ts AS TIMESTAMP)`, so oracle comparisons line up exactly.
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
          case _ => raw
        }
      case n =>
        spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
