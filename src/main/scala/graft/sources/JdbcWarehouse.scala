package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects

/** Connection profile for an external JDBC warehouse — the Spark-native
  * analogue of the reference's named Snowpark connection
  * (scripts/deployment_files/snowflake_deployer.py:43 resolves a profile
  * name; scripts/raw data loading and stream creation/
  * incremental_raw_co2data.py:22 reads it from environment.json). The
  * profile carries everything the engine needs to read, write and run
  * server-side statements against the warehouse; per-call options can
  * extend it.
  *
  * Scale levers, surfaced as first-class fields rather than buried
  * strings:
  *   - `fetchSize`: rows per JDBC round-trip on reads (10k default —
  *     drivers' defaults are often 10–100 and make a 100 GB table read
  *     latency-bound).
  *   - `batchSize`: rows per batched INSERT on writes.
  *   - `maxWritePartitions`: cap on concurrent writer connections — a
  *     1000-executor cluster must not open 1000 connections against one
  *     warehouse; the writer coalesces to this bound.
  *   - `preferTimestampNTZ`: how reads interpret the warehouse's
  *     TIMESTAMP columns. SQL TIMESTAMP (without time zone) is zone-FREE
  *     on the JDBC wire, but Spark's JDBC reader maps it to the
  *     session-zoned `TimestampType` unless this is set — so a
  *     `TIMESTAMP_NTZ` DataFrame written with [[JdbcWarehouse.writeTable]]
  *     reads back as LTZ by default and the roundtrip silently changes
  *     the column's Spark type. Set `true` when the warehouse columns
  *     are wall-clock timestamps (the reference's own shape:
  *     loading_data_sp/function.py:41-52 watermarks on a zone-free
  *     date). One profile reads every TIMESTAMP column the same way: a
  *     source mixing zoned and zone-free columns in one table cannot be
  *     round-tripped faithfully over JDBC at all (the wire erases the
  *     distinction) — split it or carry zones in a separate column.
  */
final case class JdbcProfile(
    url: String,
    user: Option[String] = None,
    password: Option[String] = None,
    driver: Option[String] = None,
    schema: Option[String] = None,
    fetchSize: Int = 10000,
    batchSize: Int = 10000,
    maxWritePartitions: Int = 16,
    preferTimestampNTZ: Boolean = false,
    extraOptions: Map[String, String] = Map.empty)

/** JDBC warehouse source/sink — the `jdbc()`-shaped facade that lets a
  * user of the reference pipeline point this engine at an external
  * warehouse (BASELINE's stated approach: "Spark SQL + JDBC source/sink
  * for Snowflake with incremental logic"). Everything rides Spark's
  * built-in, pushdown-capable JDBC source; server-side DDL/MERGE run over
  * a plain `java.sql` connection.
  *
  * Design for the 100 TB target:
  *   - READS push down: filters and column pruning reach the remote scan
  *     (`PushedFilters` in the plan), so an incremental read transfers
  *     the delta, never the table. Large tables read in parallel via
  *     [[readTablePartitioned]] (range-partitioned `WHERE` clauses, one
  *     per task).
  *   - WRITES batch (`batchSize`) and bound their connection fan-in
  *     (`maxWritePartitions`).
  *   - MERGE is server-side: the delta stages into a temp table over the
  *     same batched writer, one `MERGE INTO` statement runs in the
  *     warehouse (set-based, no row-at-a-time upserts), and the stage is
  *     dropped. Mirrors the reference's incremental MERGE
  *     (templates/co2_harmonized_sp.j2 semantics) without pulling the
  *     target table through the cluster.
  */
final class JdbcWarehouse(spark: SparkSession, profile: JdbcProfile) {
  import JdbcWarehouse.ensureQuietDerby
  ensureQuietDerby(profile.url)

  private val dialect = JdbcDialects.get(profile.url)

  /** Quoted, schema-qualified table identifier for server-side SQL. */
  def qualify(table: String): String = {
    val q = dialect.quoteIdentifier(table)
    profile.schema.map(s => s"${dialect.quoteIdentifier(s)}.$q").getOrElse(q)
  }

  /** Quoted column identifier for server-side SQL built outside this
    * class (e.g. [[JdbcIngest]]'s window-count probe).
    */
  def quoteCol(column: String): String = dialect.quoteIdentifier(column)

  private def baseOptions: Map[String, String] =
    Map("url" -> profile.url, "fetchsize" -> profile.fetchSize.toString,
        "preferTimestampNTZ" -> profile.preferTimestampNTZ.toString) ++
      profile.user.map("user" -> _) ++
      profile.password.map("password" -> _) ++
      profile.driver.map("driver" -> _) ++
      profile.extraOptions

  private def reader = spark.read.format("jdbc").options(baseOptions)

  /** Full-table read. Filters/pruning applied downstream still push into
    * the remote scan (single connection — use
    * [[readTablePartitioned]] for big tables).
    */
  def readTable(table: String): DataFrame =
    reader.option("dbtable", qualify(table)).load()

  /** Range-partitioned parallel read: `parts` concurrent connections,
    * each scanning one slice of `[lower, upper]` on `column` — the only
    * way a multi-TB warehouse table reads in acceptable time. Bounds are
    * caller-supplied (fetch them with one cheap MIN/MAX via
    * [[readQuery]]) so the planner never scans to discover them.
    */
  def readTablePartitioned(table: String, column: String,
                           lower: Long, upper: Long, parts: Int): DataFrame =
    readTablePartitioned(table, column, lower.toString, upper.toString, parts)

  /** String-bound variant: Spark's JDBC partitioner accepts date
    * (`2020-01-01`) and timestamp (`2020-01-01 12:34:56.123456`) bounds
    * when `column` is of that type — this is how a date-watermarked
    * incremental pull fans out. Bounds only set the partition stride;
    * rows outside them still land in the edge partitions, so correctness
    * never depends on them.
    */
  def readTablePartitioned(table: String, column: String,
                           lower: String, upper: String, parts: Int): DataFrame =
    reader.option("dbtable", qualify(table))
      .option("partitionColumn", column)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", parts.toString)
      .load()

  /** Predicate-partitioned parallel read: one connection per WHERE-clause
    * predicate — the fan-out path for partition column types Spark's
    * stride partitioner rejects (TIMESTAMP_NTZ). The predicates must
    * cover the wanted rows disjointly; each becomes one task's scan.
    */
  def readTablePredicates(table: String, predicates: Seq[String]): DataFrame = {
    val props = new java.util.Properties()
    baseOptions.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(profile.url, qualify(table), predicates.toArray, props)
  }

  /** Server-side query read: the statement runs in the warehouse and only
    * its result transfers (the push-a-whole-aggregation-down escape
    * hatch).
    */
  def readQuery(sql: String): DataFrame =
    reader.option("query", sql).load()

  /** High-watermark incremental read: rows with `watermarkCol` strictly
    * above `lastSeen`. The predicate pushes into the remote scan, so the
    * transfer is delta-sized — the reference's stream/offset pattern
    * expressed against a plain JDBC warehouse.
    */
  def readIncremental(table: String, watermarkCol: String,
                      lastSeen: Any): DataFrame =
    readTable(table).filter(col(watermarkCol) > lit(lastSeen))

  /** Current high watermark of `column`, computed server-side (one-row
    * result; None on an empty table).
    */
  def maxWatermark(table: String, column: String): Option[Any] = {
    val q = dialect.quoteIdentifier(column)
    val row = readQuery(
      s"SELECT MAX($q) AS hw FROM ${qualify(table)}").collect()
    row.headOption.flatMap(r => Option(r.get(0)))
  }

  /** Write `df` as `table`. Batched inserts, connection fan-in capped at
    * `maxWritePartitions`. `columnTypes` optionally overrides created
    * column DDL (e.g. `"s_name VARCHAR(64)"` where a dialect's default
    * string mapping — Derby's CLOB — cannot be grouped or compared).
    */
  def writeTable(df: DataFrame, table: String, mode: SaveMode,
                 columnTypes: Option[String] = None): Unit = {
    // coalesce never increases partition count: this caps the connection
    // fan-in without a shuffle and is a no-op for already-narrow frames
    val bounded = df.coalesce(profile.maxWritePartitions)
    val w = bounded.write.format("jdbc").options(baseOptions)
      .option("dbtable", qualify(table))
      .option("batchsize", profile.batchSize.toString)
    columnTypes.foreach(ct => w.option("createTableColumnTypes", ct))
    w.mode(mode).save()
  }

  /** Server-side upsert: stage `df` into a temp table, run one set-based
    * `MERGE INTO` keyed on `keyCols`, drop the stage. Non-key columns
    * update on match; whole rows insert on miss. The target table never
    * transfers through Spark. Creates the target from `df` when it does
    * not exist yet.
    *
    * DIALECT CONTRACT (fail-loud, not best-effort): the statement pair is
    * standard SQL — `CREATE TABLE … AS SELECT … WITH NO DATA` (SQL:2008
    * CTAS) to clone the stage and `MERGE INTO … WHEN MATCHED / WHEN NOT
    * MATCHED` (SQL:2003 F312) — verified in-process against Apache Derby
    * and accepted by warehouses implementing those features (H2, HSQLDB,
    * Oracle, DB2, PostgreSQL 15+). Warehouses KNOWN to lack one of the
    * two (MySQL/MariaDB: no MERGE; SQLite: neither) are rejected up
    * front with a pointer to the engine-side alternative
    * ([[graft.operators.MergeInto]] over a readTable/writeTable pair)
    * instead of failing mid-stage with an orphaned temp table.
    */
  def merge(df: DataFrame, table: String, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val scheme = profile.url.split(":").lift(1).getOrElse("").toLowerCase
    val noMerge = Set("mysql", "mariadb", "sqlite")
    if (noMerge.contains(scheme))
      throw new IllegalArgumentException(
        s"server-side merge is unsupported on '$scheme': it requires " +
          "standard SQL MERGE INTO and CTAS … WITH NO DATA, which this " +
          "dialect lacks. Use graft.operators.MergeInto over " +
          "readTable/writeTable, or stage-and-swap with writeTable.")
    if (!tableExists(table)) { writeTable(df, table, SaveMode.ErrorIfExists); return }
    val stage = table + "_stg_" + java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    // the stage CLONES the target's DDL (standard SQL:2008 WITH NO DATA)
    // instead of letting the dialect re-derive column types from the
    // DataFrame: a freshly-derived stage can pick a different string
    // mapping (Derby: CLOB) and LOB columns break server-side MERGE
    execute(s"CREATE TABLE ${qualify(stage)} AS SELECT * FROM " +
      s"${qualify(table)} WITH NO DATA")
    // everything after stage creation is under the finally: a failed
    // stage LOAD (connection loss, constraint violation) must not leave
    // an orphan _stg_ table behind any more than a failed MERGE
    try {
      writeTable(df, stage, SaveMode.Append)
      val cols = df.schema.fieldNames.toSeq
      val nonKey = cols.filterNot(keyCols.contains)
      val q = (c: String) => dialect.quoteIdentifier(c)
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val set = nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val ins = cols.map(q).mkString(", ")
      val vals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val matched = if (nonKey.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $set " else ""
      execute(
        s"""MERGE INTO ${qualify(table)} t USING ${qualify(stage)} s
           |ON $on
           |${matched}WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals)""".stripMargin)
    } finally dropTable(stage)
  }

  /** Run one server-side statement (DDL, MERGE, DELETE …). */
  def execute(sql: String): Unit = withConnection { conn =>
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  def tableExists(table: String): Boolean = withConnection { conn =>
    val md = conn.getMetaData
    // unquoted identifiers are case-folded by the warehouse; probe both
    val names = Seq(table, table.toUpperCase(java.util.Locale.ROOT))
    val schemaPat = profile.schema
      .map(_.toUpperCase(java.util.Locale.ROOT)).orNull
    names.exists { n =>
      val rs = md.getTables(null, schemaPat, n, Array("TABLE"))
      try rs.next() finally rs.close()
    }
  }

  def dropTable(table: String): Unit =
    if (tableExists(table)) execute(s"DROP TABLE ${qualify(table)}")

  private def withConnection[A](f: java.sql.Connection => A): A = {
    profile.driver.foreach(Class.forName)
    val props = new java.util.Properties()
    profile.user.foreach(props.setProperty("user", _))
    profile.password.foreach(props.setProperty("password", _))
    val conn = java.sql.DriverManager.getConnection(profile.url, props)
    try f(conn) finally conn.close()
  }
}

object JdbcWarehouse {
  /** Embedded Derby writes `derby.log` into the CWD unless told not to;
    * route it to the JVM temp dir once, before the engine first boots —
    * only when the user has not configured it themselves.
    */
  private def ensureQuietDerby(url: String): Unit =
    if (url.startsWith("jdbc:derby:") &&
        System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        new java.io.File(System.getProperty("java.io.tmpdir"), "derby.log")
          .getAbsolutePath)
}
