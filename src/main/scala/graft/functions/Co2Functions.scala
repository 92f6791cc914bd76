package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The reference's four scalar UDFs re-expressed as native Column functions
  * (codegen'd, no serialization boundary), plus `spark.udf.register` shims so
  * raw SQL can call them by their registered names.
  *
  * Behavioral contracts derived from the reference:
  *  - volatility: /root/reference/udfs_and_spoc/python_udf/co2_volatility/function.py:10-37
  *  - daily % change: /root/reference/udfs_and_spoc/daily_co2_changes/daily_changes/function.py:2-24
  *  - weekly % change: /root/reference/udfs_and_spoc/weekly_co2_changes/weekly_changes/function.py:1-23
  *  - normalize: /root/reference/udfs_and_spoc/normalize_co2.sql:1-13
  */
object Co2Functions {

  private val nullD: Column = lit(null).cast(DoubleType)

  /** |c-p| / ((c+p)/2) * 100, rounded to 4 decimals; NULL when either input
    * is NULL or non-positive (reference returns None on those).
    */
  def co2Volatility(current: Column, previous: Column): Column = {
    val valid =
      current.isNotNull && previous.isNotNull && current > 0d && previous > 0d
    when(
      valid,
      round(abs(current - previous) / ((current + previous) / 2d) * 100d, 4)
    ).otherwise(nullD)
  }

  /** ((current-previous)/previous)*100; 0.0 (not NULL) when previous is
    * NULL/zero or current is NULL — asymmetric with volatility on purpose.
    */
  def co2PercentChange(previous: Column, current: Column): Column = {
    val valid = previous.isNotNull && current.isNotNull && previous =!= 0d
    when(valid, (current - previous) / previous * 100d).otherwise(lit(0d))
  }

  /** Weekly variant — semantically identical formula to the daily change. */
  def co2WeeklyPercentChange(previousWeek: Column, current: Column): Column =
    co2PercentChange(previousWeek, current)

  /** Min-max scale to [0,1], rounded to 3 decimals; 0.5 when max == min. */
  def normalizeCo2(x: Column, minV: Column, maxV: Column): Column =
    when(maxV === minV, lit(0.5d))
      .otherwise(round((x - minV) / (maxV - minV), 3))

  /** The reference's DECLARED signature — NUMBER(35,4) in and out
    * (normalize_co2.sql:1-13): inputs coerced to DECIMAL(35,4), the ratio
    * rounded to 3, result cast back to DECIMAL(35,4). The double-based
    * [[normalizeCo2]] stays the engine default (SURVEY §1.2); this variant
    * closes the typed-signature parity gap.
    */
  def normalizeCo2Decimal(x: Column, minV: Column, maxV: Column): Column = {
    val d = DecimalType(35, 4)
    val (xd, mn, mx) = (x.cast(d), minV.cast(d), maxV.cast(d))
    when(mx === mn, lit(BigDecimal("0.5")).cast(d))
      .otherwise(round((xd - mn) / (mx - mn), 3).cast(d))
  }

  /** SQL-callable surface mirroring the reference's registered names. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register(
      "CALCULATE_CO2_VOLATILITY",
      (c: java.lang.Double, p: java.lang.Double) => {
        if (c == null || p == null || c <= 0d || p <= 0d) null
        else {
          val avg = (c + p) / 2d
          if (avg == 0d) null
          else
            java.lang.Double.valueOf(
              BigDecimal(math.abs(c - p) / avg * 100d)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            )
        }
      }
    )
    spark.udf.register(
      "CO2_DAILY_PERCENT_CHANGE",
      (p: java.lang.Double, c: java.lang.Double) =>
        if (p == null || c == null || p == 0d) 0d else (c - p) / p * 100d
    )
    spark.udf.register(
      "CO2_WEEKLY_PERCENT_CHANGE",
      (p: java.lang.Double, c: java.lang.Double) =>
        if (p == null || c == null || p == 0d) 0d else (c - p) / p * 100d
    )
    spark.udf.register(
      "NORMALIZE_CO2_DECIMAL",
      (x: java.math.BigDecimal, mn: java.math.BigDecimal, mx: java.math.BigDecimal) =>
        if (x == null || mn == null || mx == null) null
        else if (mx.compareTo(mn) == 0)
          new java.math.BigDecimal("0.5000").setScale(4)
        else
          x.subtract(mn)
            .divide(mx.subtract(mn), java.math.MathContext.DECIMAL128)
            .setScale(3, java.math.RoundingMode.HALF_UP)
            .setScale(4)
    )
    spark.udf.register(
      "NORMALIZE_CO2_UDF",
      (x: java.lang.Double, mn: java.lang.Double, mx: java.lang.Double) =>
        if (x == null || mn == null || mx == null) null
        else if (mx == mn) java.lang.Double.valueOf(0.5d)
        else
          java.lang.Double.valueOf(
            BigDecimal((x - mn) / (mx - mn))
              .setScale(3, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
          )
    )
  }
}
