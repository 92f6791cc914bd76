package graft

import org.scalatest.funsuite.AnyFunSuite

/** EP3 parity: the raw-SQL entry point. Tables registered as temp views,
  * queries expressed as SQL text through SparkSqlParser — including the
  * SQL-registered function surface (call_udf names).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def register(): Unit =
    Seq("lineitem", "orders", "customer", "documents").foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }

  test("aggregation + window + EXISTS all parse and run as SQL text") {
    register()
    val agg = spark.sql(
      """SELECT l_returnflag, SUM(l_quantity) s FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(agg.nonEmpty && agg.forall(_.getDouble(1) > 0))

    val win = spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rk
        |  FROM orders) WHERE rk = 1""".stripMargin)
    assert(win.count() > 0)

    val exists = spark.sql(
      """SELECT count(*) FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)
      .head.getLong(0)
    assert(exists > 0)
  }

  test("registered scalar functions are callable from SQL") {
    register()
    val r = spark.sql(
      """SELECT CALCULATE_CO2_VOLATILITY(420.5, 418.2) v,
        |       CO2_DAILY_PERCENT_CHANGE(418.2, 420.5) p,
        |       NORMALIZE_CO2_UDF(5.0, 0.0, 10.0) n,
        |       TOKEN_COUNT('one two three') t""".stripMargin).head
    assert(r.getDouble(0) > 0 && r.getDouble(1) > 0)
    assert(r.getDouble(2) == 0.5)
    assert(r.getInt(3) == 3)
  }

  test("extension-injected native functions plan as Catalyst expressions") {
    register()
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') s1,
        |       simhash64('the quick  BROWN fox') s2,
        |       rolling_fingerprint(' Hello  World ') f1,
        |       rolling_fingerprint('hello world') f2,
        |       quality_score('the quick brown fox jumps over the lazy dog') q,
        |       lang_id('der hund ist nicht da') l,
        |       cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) c,
        |       sig_agreement(minhash_text('a b c d e', 3, 64),
        |                     minhash_text('a b c d e', 3, 64)) a""".stripMargin).head
    assert(r.getLong(0) != 0L)
    assert(r.getLong(2) == r.getLong(3)) // fingerprint normalization
    assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1)
    assert(r.getString(5) == "de")
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12)
    assert(r.getDouble(7) == 1.0)
    // planned as native expressions, not UDF wrappers
    val plan = spark.sql("SELECT quality_score(text) FROM documents")
      .queryExecution.analyzed.toString
    assert(plan.contains("quality_score") && !plan.contains("UDF"), plan)
  }

  test("documents text analysis via SQL over the same engine") {
    register()
    val n = spark.sql(
      "SELECT count(DISTINCT md5(text)) FROM documents").head.getLong(0)
    assert(n > 0)
  }
}
