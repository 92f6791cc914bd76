package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump one query's result to `outDir/<name>` (parquet). A throwing
    * query must be LOUD in the artifacts: a stderr line alone lets the
    * driver silently drop the CORRECTNESS row and "all green" masquerade
    * as a clean round (exactly how the round-6 q17 break nearly escaped
    * notice) — so failure writes an `outDir/<name>.FAILED` marker with
    * the error, and any prior result for the name is pre-deleted so stale
    * output can never mask a new failure. Returns true on success.
    */
  def dumpOne(spark: SparkSession, outDir: String, name: String,
              fn: (SparkSession, String) => DataFrame,
              sfDir: String): Boolean = {
    // pre-delete so a failed query can NEVER be masked by stale results
    // of a previous run in the same outDir
    val dest = Paths.get(s"$outDir/$name")
    if (Files.exists(dest)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dest).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val marker = Paths.get(s"$outDir/$name.FAILED")
    Files.deleteIfExists(marker)
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      Files.writeString(marker, s"${e.getClass.getName}: ${e.getMessage}\n")
      false
    }
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name filter for targeted local
    // runs (the driver always passes exactly two args → full catalog)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // the tuned session (nanos-parquet compat, extensions, AQE) — a plain
    // builder here once let events-reading queries fail while stale output
    // from an earlier run masked it
    val spark = GraftSession.get(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        dumpOne(spark, outDir, name, fn, sfDir)
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
