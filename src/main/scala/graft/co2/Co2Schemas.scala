package graft.co2

import org.apache.spark.sql.types._

/** Explicit StructType constants for every pipeline table — fixed declared
  * schemas, never inference on the hot path (reference DDL:
  * /root/reference/scripts/raw data loading and stream creation/
  * raw_co2_data.py:61-69; udfs_and_spoc/co2_harmonized_sp/co2_harmonized_sp/
  * function.py:61-70; co2_analytical_sp/co2_analytical_sp/function.py:57-83).
  */
object Co2Schemas {

  val raw: StructType = StructType(Seq(
    StructField("YEAR", IntegerType),
    StructField("MONTH", IntegerType),
    StructField("DAY", IntegerType),
    StructField("DECIMAL_DATE", DoubleType),
    StructField("CO2_PPM", DoubleType)
  ))

  val harmonized: StructType = StructType(Seq(
    StructField("DATE", DateType),
    StructField("YEAR", IntegerType),
    StructField("MONTH", IntegerType),
    StructField("DAY", IntegerType),
    StructField("CO2_PPM", DoubleType),
    StructField("META_UPDATED_AT", TimestampType)
  ))

  val dailyStats: StructType = StructType(Seq(
    StructField("DATE", DateType),
    StructField("CO2_PPM", DoubleType),
    StructField("PREV_DAY_CO2", DoubleType),
    StructField("DAILY_CHANGE", DoubleType),
    StructField("DAILY_VOLATILITY", DoubleType),
    StructField("NORMALIZED_CO2", DoubleType),
    StructField("META_UPDATED_AT", TimestampType)
  ))

  val weeklyStats: StructType = StructType(Seq(
    StructField("WEEK_START", DateType),
    StructField("AVG_WEEKLY_CO2", DoubleType),
    StructField("WEEK_START_CO2", DoubleType),
    StructField("WEEK_END_CO2", DoubleType),
    StructField("WEEKLY_CHANGE", DoubleType),
    StructField("WEEKLY_VOLATILITY", DoubleType),
    StructField("NORMALIZED_WEEKLY_CO2", DoubleType),
    StructField("META_UPDATED_AT", TimestampType)
  ))

  val minMax: StructType = StructType(Seq(
    StructField("MIN_CO2", DoubleType),
    StructField("MAX_CO2", DoubleType)
  ))
}
