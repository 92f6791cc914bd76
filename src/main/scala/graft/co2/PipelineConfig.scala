package graft.co2

import org.apache.spark.sql.SparkSession

/** Environment configuration layer — the reference drives dev/prod setup
  * from flat YAML (`config/dev.yml:1-24`, `config/prod.yml:1-21`,
  * consumed by `templates/setup.sql.j2:50-53`): database name, warehouse
  * sizing, schema list, task cron, feed location.
  *
  * Spark mapping:
  *  - `database_name` → the warehouse ROOT directory for this env's
  *    [[graft.storage.VersionedTable]]s and the registered catalog name;
  *  - `schemas` → namespace directories under the root (visible to
  *    `SHOW NAMESPACES IN <catalog>`);
  *  - `warehouse_size` / `warehouse_suspend` → documented no-ops (Spark
  *    capacity is the cluster's executor allocation, not a per-query
  *    warehouse), retained so env files round-trip;
  *  - `s3_url` → the feed base handed to [[FeedSource]];
  *  - `task_schedule` → exposed verbatim for an external scheduler
  *    (cron / Airflow), matching the reference's EXTERNAL-scheduler stance
  *    (orchestrate_tasks.sql.j2 tasks are cron-driven there too).
  */
final case class PipelineConfig(
    env: String,
    databaseName: String,
    roleName: String,
    warehouseName: String,
    warehouseSize: String,
    warehouseSuspendSecs: Int,
    feedUrl: String,
    schemas: Seq[String],
    taskSchedule: String,
    executeTasksImmediately: Boolean,
    storageIntegrationName: Option[String]) {

  /** This env's warehouse root under `base`. */
  def warehouseRoot(base: String): String = s"$base/$databaseName"

  /** Catalog name for [[graft.sql.GraftCatalog.register]]. */
  def catalogName: String = databaseName.toLowerCase
}

object PipelineConfig {

  /** Parse the reference's flat-YAML shape: `key: value` scalars, one
    * level of `- item` lists, `#` comments, optional quotes. (No external
    * YAML dependency — the grammar actually used by the config files is
    * this small.)
    */
  def parse(text: String): PipelineConfig = {
    val scalars = scala.collection.mutable.Map[String, String]()
    val lists = scala.collection.mutable.Map[String, Vector[String]]()
    var currentList: Option[String] = None
    // quote-aware comment strip: '#' only starts a comment OUTSIDE quotes,
    // and a quote only QUOTES when it begins a value (right after ':' or a
    // list '-') — an apostrophe inside an unquoted scalar is just data
    def stripComment(raw: String): String = {
      var inQuote: Char = 0
      var atValueStart = false
      var seenContent = false
      val sb = new StringBuilder
      var i = 0
      var done = false
      while (i < raw.length && !done) {
        val c = raw.charAt(i)
        if (inQuote != 0) {
          if (c == inQuote) inQuote = 0
          sb.append(c)
        } else c match {
          case '#' => done = true
          case ':' => atValueStart = true; sb.append(c)
          case '-' if !seenContent => atValueStart = true; seenContent = true; sb.append(c)
          case '"' | '\'' if atValueStart => inQuote = c; atValueStart = false; sb.append(c)
          case ' ' | '\t' => sb.append(c)
          case other => atValueStart = false; seenContent = true; sb.append(other)
        }
        i += 1
      }
      sb.toString
    }
    for (raw <- text.linesIterator) {
      val line = stripComment(raw)
      val t = line.trim
      if (t.nonEmpty) {
        if (t.startsWith("- ") || t == "-") {
          currentList.foreach { k =>
            lists(k) = lists.getOrElse(k, Vector.empty) :+ unquote(t.drop(1).trim)
          }
        } else if (t.endsWith(":")) {
          currentList = Some(t.dropRight(1).trim)
        } else {
          val i = t.indexOf(':')
          if (i > 0) {
            currentList = None
            scalars(t.take(i).trim) = unquote(t.drop(i + 1).trim)
          }
        }
      }
    }
    def req(k: String) = scalars.getOrElse(k,
      throw new IllegalArgumentException(s"config missing required key: $k"))
    PipelineConfig(
      env = req("env"),
      databaseName = req("database_name"),
      roleName = scalars.getOrElse("role_name", ""),
      warehouseName = scalars.getOrElse("warehouse_name", ""),
      warehouseSize = scalars.getOrElse("warehouse_size", "XSMALL"),
      warehouseSuspendSecs = scalars.get("warehouse_suspend").map(_.toInt).getOrElse(300),
      feedUrl = scalars.getOrElse("s3_url", ""),
      schemas = lists.getOrElse("schemas", Vector.empty).distinct,
      taskSchedule = scalars.getOrElse("task_schedule", ""),
      // absent key → FALSE: "run the task DAG right now" must be opt-in
      executeTasksImmediately =
        scalars.get("execute_tasks_immediately").exists(_.toBoolean),
      storageIntegrationName = scalars.get("storage_integration_name"))
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
      ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  def load(path: String): PipelineConfig =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Env bootstrap (setup.sql.j2 parity): create the database root and
    * schema namespaces, register the SQL catalog, and hand back the
    * pipeline rooted there.
    */
  def bootstrap(spark: SparkSession, cfg: PipelineConfig, base: String): Co2Pipeline = {
    val root = cfg.warehouseRoot(base)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfg.schemas.foreach(s =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/$s")))
    graft.sql.GraftCatalog.register(spark, cfg.catalogName, root)
    Co2Pipeline(spark, root)
  }
}
