package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus source/sink — the de-facto
  * interchange format for LLM training corpora (one JSON document per
  * line). Thin, deliberate wrappers over Spark's native json source
  * (distributed, line-splittable, whole-stage-codegen-friendly) that pin
  * the two contracts a 100 TB ingest needs and which the defaults get
  * wrong:
  *
  *  - an EXPLICIT schema, never `inferSchema`: inference is a full extra
  *    pass over the data before the real read (2× the scan at scale) and
  *    can silently widen types between runs;
  *  - PERMISSIVE mode with a named corrupt-record column: malformed
  *    lines are ROUTED into [[CorruptCol]] (for a quarantine sink /
  *    audit count) instead of failing the job (FAILFAST) or silently
  *    vanishing (DROPMALFORMED). One bad line in a terabyte must neither
  *    kill the ingest nor disappear without trace.
  *
  * Reference-parity note: the reference's CSV ingest uses the same
  * route-don't-drop posture (`ON_ERROR=CONTINUE`,
  * `raw_co2_data.py:77-95`); this is that contract for the JSON format.
  */
object Jsonl {

  /** Name of the synthesized column holding the raw text of lines that
    * failed to parse (NULL for valid rows).
    */
  val CorruptCol = "_corrupt_record"

  /** Write one JSON object per line. Text fields round-trip exactly
    * (newlines and quotes are JSON-escaped, so one record stays one
    * line; unicode survives byte-for-byte).
    */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** Read with the explicit `schema`; malformed lines come back as rows
    * with NULL fields and the raw line in [[CorruptCol]].
    *
    * Caveat (Spark contract): a query that references ONLY the corrupt
    * column gets rejected by the json source after column pruning —
    * aggregate valid-vs-corrupt in one pass over both (see
    * `q104_jsonl_roundtrip`) or project a data column alongside it.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a $CorruptCol column")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)
  }

  /** Valid rows only, corrupt column dropped. */
  def valid(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)
}
