package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets

/** A versioned Parquet table with an append-only commit log — the minimal
  * transactional substrate vanilla Spark lacks (no MERGE/UPDATE over plain
  * parquet). Equivalent role to the reference's Snowflake tables + streams
  * offset bookkeeping (/root/reference/udfs_and_spoc/co2_harmonized_sp/
  * co2_harmonized_sp/function.py:119-153).
  *
  * Layout:
  * {{{
  *   root/
  *     _commits/00000001.json   // {"version":1,"parts":[...],"offsets":{...}}
  *     v_00000001/ *.parquet    // data directory referenced by commits
  * }}}
  *
  * Correctness at scale:
  *  - A commit is a single O(1) file created with overwrite=false — an
  *    atomic claim on HDFS and object stores with conditional create.
  *    Readers list `_commits` and take the max committed version; a crashed
  *    writer leaves only an unreferenced data dir (garbage, never corruption).
  *  - `offsets` piggyback consumed change-feed positions on the same commit,
  *    giving merge-consumes-stream the reference's exactly-once contract.
  *  - Appends add a new part directory; no rewrite of existing data.
  */
final class VersionedTable(spark: SparkSession, val root: String) {

  case class State(version: Long, parts: Seq[String], offsets: Map[String, Long])

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def commitsDir = new Path(root, "_commits")

  def exists: Boolean = fs.exists(commitsDir) && state.isDefined

  def state: Option[State] = {
    if (!fs.exists(commitsDir)) return None
    val files = fs.listStatus(commitsDir).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
    if (files.isEmpty) return None
    val latest = files.maxBy(p => p.getName.stripSuffix(".json").toLong)
    Some(parseState(readString(latest)))
  }

  def read: DataFrame = state match {
    case Some(s) if s.parts.nonEmpty =>
      spark.read.parquet(s.parts.map(p => s"$root/$p"): _*)
    case _ =>
      throw new IllegalStateException(s"table at $root has no committed data")
  }

  def readOr(schema: StructType): DataFrame =
    if (exists) read
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def offsets: Map[String, Long] = state.map(_.offsets).getOrElse(Map.empty)

  /** Replace table contents (CREATE OR REPLACE / CTAS semantics). */
  def overwrite(df: DataFrame, offsets: Map[String, Long] = Map.empty): Long =
    commit(df, replace = true, offsets)

  /** Append a new part (COPY INTO / INSERT semantics). */
  def append(df: DataFrame, offsets: Map[String, Long] = Map.empty): Long =
    commit(df, replace = false, offsets)

  private def commit(df: DataFrame, replace: Boolean,
                     newOffsets: Map[String, Long]): Long = {
    val prev = state
    val version = prev.map(_.version).getOrElse(0L) + 1
    val partName = f"v_$version%08d"
    df.write.mode("overwrite").parquet(s"$root/$partName")
    val parts =
      if (replace) Seq(partName)
      else prev.map(_.parts).getOrElse(Seq.empty) :+ partName
    val offs = prev.map(_.offsets).getOrElse(Map.empty) ++ newOffsets
    writeCommit(version, State(version, parts, offs))
    version
  }

  private def writeCommit(version: Long, s: State): Unit = {
    fs.mkdirs(commitsDir)
    val path = new Path(commitsDir, f"$version%08d.json")
    // overwrite=false → create is an atomic claim; a concurrent writer loses.
    val out = fs.create(path, false)
    try out.write(renderState(s).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  // Tiny hand-rolled JSON for the fixed-shape state record (no extra deps).
  private def renderState(s: State): String = {
    val parts = s.parts.map(p => "\"" + p + "\"").mkString("[", ",", "]")
    val offs = s.offsets.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    s"""{"version":${s.version},"parts":$parts,"offsets":$offs}"""
  }

  private def parseState(json: String): State = {
    val version = """"version":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    val parts = """"parts":\[([^\]]*)\]""".r.findFirstMatchIn(json).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    val offsets = """"offsets":\{([^}]*)\}""".r.findFirstMatchIn(json).get.group(1)
      .split(",").filter(_.contains(":")).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
      }.toMap
    State(version, parts, offsets)
  }
}

object VersionedTable {
  def apply(spark: SparkSession, root: String): VersionedTable =
    new VersionedTable(spark, root)
}
