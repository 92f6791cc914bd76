package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Co2Functions._

/** Contract vectors ported from the reference's pytest suites:
  * /root/reference/tests/test_volatility_co2ppm.py,
  * test_daily_co2_changes.py, test_weekly_co2_changes.py,
  * and udfs_and_spoc/normalize_co2.sql.
  */
class Co2FunctionsSpec extends AnyFunSuite {

  test("normalizeCo2Decimal: NUMBER(35,4) signature parity (normalize_co2.sql)") {
    val spark0 = TestSpark.session
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (BigDecimal("420.1234"), BigDecimal("400.0000"), BigDecimal("440.0000")),
      (BigDecimal("400.0000"), BigDecimal("400.0000"), BigDecimal("400.0000")) // max==min
    ).toDF("x", "mn", "mx")
    val out = df.select(
      graft.functions.Co2Functions.normalizeCo2Decimal(col("x"), col("mn"), col("mx")).as("n"))
    assert(out.schema("n").dataType ==
      org.apache.spark.sql.types.DecimalType(35, 4))
    val vals = out.collect().map(_.getDecimal(0))
    assert(vals(0) == new java.math.BigDecimal("0.5030").setScale(4))
    assert(vals(1) == new java.math.BigDecimal("0.5000").setScale(4))
    // SQL-registered decimal surface
    val viaSql = spark0.sql(
      "SELECT NORMALIZE_CO2_DECIMAL(CAST(420.1234 AS DECIMAL(35,4)), CAST(400 AS DECIMAL(35,4)), CAST(440 AS DECIMAL(35,4)))").head.getDecimal(0)
    assert(viaSql.compareTo(new java.math.BigDecimal("0.503")) == 0)
  }
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def evalVol(c: java.lang.Double, p: java.lang.Double): Option[Double] =
    Seq((c, p)).toDF("c", "p")
      .select(co2Volatility($"c", $"p").as("v"))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  private def evalChange(p: java.lang.Double, c: java.lang.Double): Double =
    Seq((p, c)).toDF("p", "c")
      .select(co2PercentChange($"p", $"c").as("v"))
      .collect().head.getDouble(0)

  private def evalNorm(x: Double, mn: Double, mx: Double): Double =
    Seq((x, mn, mx)).toDF("x", "mn", "mx")
      .select(normalizeCo2($"x", $"mn", $"mx").as("v"))
      .collect().head.getDouble(0)

  test("volatility: normal cases") {
    assert(math.abs(evalVol(410.0, 400.0).get - 2.4691) < 1e-9)
    assert(math.abs(evalVol(400.0, 410.0).get - 2.4691) < 1e-9) // symmetric
    assert(evalVol(350.0, 350.0).get == 0.0)
    assert(evalVol(500.0, 300.0).get == 50.0)
  }

  test("volatility: invalid inputs -> NULL") {
    assert(evalVol(null, 400.0).isEmpty)
    assert(evalVol(410.0, null).isEmpty)
    assert(evalVol(0.0, 400.0).isEmpty)
    assert(evalVol(-5.0, 400.0).isEmpty)
    assert(evalVol(410.0, -1.0).isEmpty)
  }

  test("daily percent change: normal + invalid -> 0.0") {
    assert(math.abs(evalChange(100.0, 110.0) - 10.0) < 1e-12)
    assert(math.abs(evalChange(110.0, 100.0) - (-9.090909090909092)) < 1e-12)
    assert(evalChange(0.0, 100.0) == 0.0)       // zero prev -> 0.0
    assert(evalChange(100.0, 0.0) == -100.0)
    assert(evalChange(null, 100.0) == 0.0)
    assert(evalChange(100.0, null) == 0.0)
  }

  test("weekly percent change: same formula, 10000% large case") {
    val v = Seq((1.0, 101.0)).toDF("p", "c")
      .select(co2WeeklyPercentChange($"p", $"c").as("v"))
      .collect().head.getDouble(0)
    assert(v == 10000.0)
    assert(math.abs({
      Seq((410.5, 412.3)).toDF("p", "c")
        .select(co2WeeklyPercentChange($"p", $"c").as("v"))
        .collect().head.getDouble(0)
    } - 0.4384896467722289) < 1e-9)
  }

  test("normalize: minmax scaling, 0.5 on degenerate range, in [0,1]") {
    assert(evalNorm(350.0, 300.0, 400.0) == 0.5)
    assert(evalNorm(300.0, 300.0, 400.0) == 0.0)
    assert(evalNorm(400.0, 300.0, 400.0) == 1.0)
    assert(evalNorm(123.4, 50.0, 50.0) == 0.5)
    assert(evalNorm(333.3, 300.0, 400.0) == 0.333)
  }

  test("SQL-registered surface callable from spark.sql") {
    graft.functions.Co2Functions.registerAll(spark)
    val r = spark.sql(
      "SELECT CALCULATE_CO2_VOLATILITY(410.0, 400.0) v, " +
        "CO2_DAILY_PERCENT_CHANGE(100.0, 110.0) d, " +
        "NORMALIZE_CO2_UDF(350.0, 300.0, 400.0) n"
    ).collect().head
    assert(math.abs(r.getDouble(0) - 2.4691) < 1e-9)
    assert(math.abs(r.getDouble(1) - 10.0) < 1e-12)
    assert(r.getDouble(2) == 0.5)
  }
}
