package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.co2.PipelineConfig
import java.nio.file.Files

/** Env-config layer: the reference's dev/prod flat-YAML shape parses, and
  * bootstrap creates the database root + schema namespaces wired into the
  * SQL catalog.
  */
class PipelineConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val devYml =
    """env: "dev"
      |database_name: "CO2_DB_DEV"
      |role_name: "CO2_ROLE_DEV"
      |warehouse_name: "CO2_WH_DEV"
      |warehouse_size: "XSMALL"
      |warehouse_suspend: 300
      |s3_url: "s3://example-bucket/noaa-co2-data/"
      |use_storage_integration: false
      |schemas:
      |  - "EXTERNAL"
      |  - "RAW_CO2"
      |  - "HARMONIZED_CO2"
      |  - "ANALYTICS_CO2"
      |  - "EXTERNAL"
      |
      |# Task configuration
      |task_schedule: 'USING CRON 0 10 * * * UTC'  # Runs at 10 AM UTC daily
      |execute_tasks_immediately: true
      |
      |storage_integration_name: CO2_S3_INTEGRATION""".stripMargin

  test("flat-YAML config parses: scalars, quoted values, lists, comments, dedup") {
    val cfg = PipelineConfig.parse(devYml)
    assert(cfg.env == "dev" && cfg.databaseName == "CO2_DB_DEV")
    assert(cfg.warehouseSize == "XSMALL" && cfg.warehouseSuspendSecs == 300)
    assert(cfg.feedUrl.startsWith("s3://example-bucket/"))
    // duplicate EXTERNAL collapses; order preserved
    assert(cfg.schemas == Seq("EXTERNAL", "RAW_CO2", "HARMONIZED_CO2", "ANALYTICS_CO2"))
    assert(cfg.taskSchedule == "USING CRON 0 10 * * * UTC")
    assert(cfg.executeTasksImmediately)
    assert(cfg.storageIntegrationName.contains("CO2_S3_INTEGRATION"))
    assert(cfg.catalogName == "co2_db_dev")
  }

  test("missing required keys raise") {
    intercept[IllegalArgumentException] { PipelineConfig.parse("env: dev\n") }
  }

  test("'#' inside quoted values is data, not a comment; absent run-now flag is false") {
    val cfg = PipelineConfig.parse(
      """env: dev
        |database_name: "DB"
        |s3_url: "s3://bucket/data#v2"   # trailing comment
        |task_schedule: 'CRON 0 10 * * * # not a comment'
        |""".stripMargin)
    assert(cfg.feedUrl == "s3://bucket/data#v2")
    assert(cfg.taskSchedule == "CRON 0 10 * * * # not a comment")
    assert(!cfg.executeTasksImmediately) // opt-in, not vacuous-true
    // an apostrophe INSIDE an unquoted scalar is data, not a quote opener
    val cfg2 = PipelineConfig.parse(
      "env: dev\ndatabase_name: TOM'S_DB  # prod box\n")
    assert(cfg2.databaseName == "TOM'S_DB")
  }

  test("bootstrap creates database root + schema namespaces and registers the catalog") {
    val base = Files.createTempDirectory("cfg_boot_").toString
    val cfg = PipelineConfig.parse(devYml)
    val p = PipelineConfig.bootstrap(spark, cfg, base)
    assert(new java.io.File(s"$base/CO2_DB_DEV/RAW_CO2").isDirectory)
    val ns = spark.sql(s"SHOW NAMESPACES IN ${cfg.catalogName}")
      .collect().map(_.getString(0)).toSet
    assert(Set("RAW_CO2", "HARMONIZED_CO2", "ANALYTICS_CO2").subsetOf(ns))
    // the bootstrapped pipeline writes under the configured root
    assert(p.raw.root.startsWith(s"$base/CO2_DB_DEV"))
  }

  test("config file round-trip via load()") {
    val f = Files.createTempFile("cfg_", ".yml")
    Files.writeString(f, devYml)
    assert(PipelineConfig.load(f.toString) == PipelineConfig.parse(devYml))
  }
}
