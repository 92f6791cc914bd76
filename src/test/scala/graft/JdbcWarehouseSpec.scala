package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JdbcProfile, JdbcWarehouse}

/** JDBC warehouse facade against an in-process Derby database — the
  * source/sink shape a user points at an external warehouse (the
  * BASELINE's "Spark SQL + JDBC source/sink … with incremental logic").
  */
class JdbcWarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshWh(): JdbcWarehouse = {
    val db = "memory:graft_spec_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    new JdbcWarehouse(spark, JdbcProfile(
      url = s"jdbc:derby:$db;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver")))
  }

  private def people = Seq(
    (1L, "ada", 10.0), (2L, "bob", 20.0), (3L, "cyd", 30.0), (4L, "dee", 40.0)
  ).toDF("id", "name", "bal")

  test("write then read round-trips rows and schema") {
    val wh = freshWh()
    wh.writeTable(people, "people", SaveMode.Overwrite,
      columnTypes = Some("name VARCHAR(32)"))
    val back = wh.readTable("people")
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("bal", "id", "name"))
    assert(back.as[(Long, String, Double)].collect().toSet ==
      people.as[(Long, String, Double)].collect().toSet)
    assert(wh.tableExists("people") && !wh.tableExists("nope"))
  }

  test("incremental read pushes the watermark predicate into the scan") {
    val wh = freshWh()
    wh.writeTable(people, "people", SaveMode.Overwrite)
    assert(wh.maxWatermark("people", "id").contains(4L))
    val inc = wh.readIncremental("people", "id", 2L)
    assert(inc.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // the filter must reach the remote scan, not run in Spark post-hoc
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,2)"), plan)
    assert(!plan.contains("PushedFilters: []"), plan)
  }

  test("partitioned read fans out to N slices with row parity") {
    val wh = freshWh()
    val big = spark.range(1, 1001).select(col("id"),
      (col("id") % 7).cast("double").as("bal"))
    wh.writeTable(big, "big", SaveMode.Overwrite)
    val part = wh.readTablePartitioned("big", "ID", 1L, 1000L, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 1000)
    assert(part.agg(sum("bal")).as[Double].head() ==
      big.agg(sum("bal")).as[Double].head())
  }

  test("readQuery runs server-side: only the aggregate transfers") {
    val wh = freshWh()
    wh.writeTable(people, "people", SaveMode.Overwrite)
    val agg = wh.readQuery(
      "SELECT COUNT(*) AS n, SUM(\"bal\") AS total FROM \"people\"")
    val r = agg.collect()(0)
    // Derby surfaces COUNT(*) as INTEGER — read numerically, not as long
    assert(r.getAs[Number](0).longValue == 4L && r.getDouble(1) == 100.0)
  }

  test("merge upserts server-side: updates on match, inserts on miss") {
    val wh = freshWh()
    wh.writeTable(people, "people", SaveMode.Overwrite,
      columnTypes = Some("name VARCHAR(32)"))
    val delta = Seq((2L, "bob2", 25.0), (5L, "eve", 50.0))
      .toDF("id", "name", "bal")
    wh.merge(delta, "people", Seq("id"))
    val out = wh.readTable("people").as[(Long, String, Double)]
      .collect().map { case (k, n, b) => k -> (n, b) }.toMap
    assert(out.size == 5)
    assert(out(2L) == ("bob2", 25.0)) // matched: updated
    assert(out(5L) == ("eve", 50.0))  // missed: inserted
    assert(out(1L) == ("ada", 10.0))  // untouched
    // no stage tables left behind
    assert(wh.readQuery(
      "SELECT COUNT(*) AS n FROM SYS.SYSTABLES WHERE TABLENAME LIKE 'people_stg%'")
      .collect()(0).getAs[Number](0).longValue == 0L)
  }

  test("merge creates the target when it does not exist") {
    val wh = freshWh()
    wh.merge(people, "fresh", Seq("id"))
    assert(wh.readTable("fresh").count() == 4)
    // second merge with same rows is idempotent on count
    wh.merge(people, "fresh", Seq("id"))
    assert(wh.readTable("fresh").count() == 4)
  }

  test("merge fails loud on dialects without standard MERGE (no orphaned stage)") {
    import spark.implicits._
    // MySQL-shaped URL: rejected BEFORE any server round-trip, with a
    // pointer to the engine-side alternative
    val wh = new JdbcWarehouse(spark, JdbcProfile(
      url = "jdbc:mysql://example.invalid:3306/db"))
    val e = intercept[IllegalArgumentException](
      wh.merge(Seq((1L, "a")).toDF("k", "v"), "t", Seq("k")))
    assert(e.getMessage.contains("unsupported on 'mysql'"))
    assert(e.getMessage.contains("MergeInto"))
  }

  test("type-fidelity matrix: INT/BIGINT/DOUBLE/DECIMAL/DATE/TIMESTAMP_NTZ/VARCHAR survive writeTable -> readTable") {
    // zone-free warehouse: TIMESTAMP columns read back as TIMESTAMP_NTZ
    val db = "memory:graft_tf_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val wh = new JdbcWarehouse(spark, JdbcProfile(
      url = s"jdbc:derby:$db;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"),
      preferTimestampNTZ = true))
    val src = Seq(1).toDF("one").select(
      lit(42).as("c_int"),
      lit(1234567890123L).as("c_long"),
      lit(2.75).as("c_double"),
      lit(BigDecimal("123456789.123")).cast("decimal(12,3)").as("c_dec"),
      lit(java.sql.Date.valueOf("2021-03-04")).as("c_date"),
      lit(java.time.LocalDateTime.of(2021, 3, 4, 5, 6, 7, 123456000)).as("c_ntz"),
      lit("abc").as("c_str"))
    wh.writeTable(src, "tf", SaveMode.Overwrite,
      columnTypes = Some("c_str VARCHAR(16)"))
    val back = wh.readTable("tf")
    val types = back.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType.sql).toMap
    assert(types == Map(
      "c_int" -> "INT", "c_long" -> "BIGINT", "c_double" -> "DOUBLE",
      "c_dec" -> "DECIMAL(12,3)", "c_date" -> "DATE",
      "c_ntz" -> "TIMESTAMP_NTZ", "c_str" -> "STRING"), types)
    val r = back.head()
    assert(r.getAs[java.math.BigDecimal]("c_dec")
      .compareTo(new java.math.BigDecimal("123456789.123")) == 0)
    assert(r.getAs[java.sql.Date]("c_date") == java.sql.Date.valueOf("2021-03-04"))
    assert(r.getAs[java.time.LocalDateTime]("c_ntz") ==
      java.time.LocalDateTime.of(2021, 3, 4, 5, 6, 7, 123456000))
  }

  test("TIMESTAMP zone semantics follow the profile knob, not the written type") {
    // the JDBC wire carries no zone: the reader's preferTimestampNTZ
    // decides the Spark type of every TIMESTAMP column. Default profile
    // (LTZ) retypes a written NTZ column — the exact q121 bug shape,
    // pinned here so the erasure stays documented and deliberate.
    val ntz = Seq(1).toDF("one").select(
      lit(java.time.LocalDateTime.of(2021, 3, 4, 5, 6, 7)).as("c_ts"))
    val ltzWh = freshWh()
    ltzWh.writeTable(ntz, "tz", SaveMode.Overwrite)
    assert(ltzWh.readTable("tz").schema("c_ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // and an LTZ column written under an NTZ profile reads back NTZ:
    // wall-clock in the session zone (UTC here), instant identity lost
    val db = "memory:graft_tz_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val ntzWh = new JdbcWarehouse(spark, JdbcProfile(
      url = s"jdbc:derby:$db;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"),
      preferTimestampNTZ = true))
    val ltz = Seq(1).toDF("one").select(
      lit(java.sql.Timestamp.valueOf("2021-03-04 05:06:07")).as("c_ts"))
    ntzWh.writeTable(ltz, "tz2", SaveMode.Overwrite)
    assert(ntzWh.readTable("tz2").schema("c_ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
  }

  test("supplier parquet -> jdbc -> merge -> incremental read (pipeline shape)") {
    val dir = "/root/testdata/sf0.001"
    val wh = freshWh()
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
    wh.writeTable(sup, "supplier", SaveMode.Overwrite,
      columnTypes = Some("s_name VARCHAR(64)"))
    val delta = sup.filter(col("s_suppkey") % 10 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + lit(1000.0))
    wh.merge(delta, "supplier", Seq("s_suppkey"))
    val back = wh.readIncremental("supplier", "s_suppkey", -1L)
    assert(back.count() == sup.count())
    val updated = back.filter(col("s_suppkey") % 10 === 0)
      .join(sup.select(col("s_suppkey"),
        col("s_acctbal").as("orig")), "s_suppkey")
    assert(updated.filter(col("s_acctbal") =!= col("orig") + 1000.0)
      .count() == 0)
  }
}
