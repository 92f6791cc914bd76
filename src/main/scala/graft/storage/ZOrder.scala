package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Morton (Z-order) key construction for multi-dimension clustering.
  *
  * Linear clustering ([[VersionedTable.compactClustered]], Snowflake
  * clustering keys) sorts lexicographically: zone maps get TIGHT on the
  * first key and stay WIDE on every later one, so a predicate that
  * touches only the second dimension prunes nothing. Interleaving the
  * bits of each dimension's rank (the Morton curve) gives every part a
  * bounded rectangle in ALL dimensions at once — a 2-D box predicate
  * then skips all parts whose rectangle misses the box, which is the
  * Delta/Databricks `OPTIMIZE ZORDER BY` behavior re-expressed on this
  * table format's footer-harvested zone maps.
  *
  * The key is pure `functions._` column algebra (codegen'd end to end):
  * per-dimension min/max from ONE bounded 1-row aggregate, scale to a
  * 2^bits grid, then the classic mask-and-shift bit spread. No UDF, no
  * custom expression, no second pass over the data.
  */
object ZOrder {

  /** Z-order key column over 2 or 3 numeric/date/timestamp columns of
    * `df`. `bits` per dimension: ≤16 for 2 columns (32-bit key), ≤21 for
    * 3 (63-bit key). Runs one 1-row aggregate on `df` to learn each
    * dimension's [min, max]; NULL values land in bucket 0 (first cell of
    * the curve), mirroring NULLS FIRST ordering.
    */
  def key(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size == 2 || cols.size == 3,
      s"z-order interleaves 2 or 3 dimensions, got ${cols.size}")
    val maxBits = if (cols.size == 2) 16 else 21
    require(bits >= 1 && bits <= maxBits,
      s"bits must be in [1, $maxBits] for ${cols.size} dimensions")
    val nums = cols.map(c => toDouble(df, c))
    // one bounded 1-row collect (same class as the engine's other scalar
    // aggregates): the per-dimension domain
    val aggCols = nums.zipWithIndex.flatMap { case (n, i) =>
      Seq(min(n).as(s"m$i"), max(n).as(s"x$i")) }
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val spread: Column => Column =
      if (cols.size == 2) spreadBy1 else spreadBy2
    val maxBucket = (1L << bits) - 1
    val lanes = nums.zipWithIndex.map { case (n, i) =>
      val lo = if (stats.isNullAt(stats.fieldIndex(s"m$i"))) 0.0
               else stats.getDouble(stats.fieldIndex(s"m$i"))
      val hi = if (stats.isNullAt(stats.fieldIndex(s"x$i"))) 0.0
               else stats.getDouble(stats.fieldIndex(s"x$i"))
      val bucket =
        if (hi <= lo) lit(0L)
        else least(lit(maxBucket), greatest(lit(0L),
          floor((coalesce(n, lit(lo)) - lit(lo)) * maxBucket / (lit(hi) - lit(lo)))
            .cast("long")))
      shiftleft(spread(bucket), i)
    }
    lanes.reduce(_ bitwiseOR _)
  }

  private def toDouble(df: DataFrame, c: String): Column = {
    val field = df.schema.find(f =>
      f.name.equalsIgnoreCase(c)).getOrElse(
      throw new IllegalArgumentException(s"no column $c in ${df.schema.fieldNames.mkString(", ")}"))
    field.dataType match {
      case DateType => unix_date(col(c)).cast("double")
      // NTZ has no direct double cast; the tz-shift is monotonic, which is
      // all a space-filling curve needs
      case TimestampNTZType => col(c).cast("timestamp").cast("double")
      case _: TimestampType => col(c).cast("double")
      case _: NumericType => col(c).cast("double")
      case dt => throw new IllegalArgumentException(
        s"z-order column $c has unorderable-for-zorder type $dt " +
          "(numeric, date, and timestamp are supported)")
    }
  }

  /** Spread the low 16 bits of `c` so a second lane fits between them
    * (Morton part1by1, the standard mask ladder).
    */
  private[graft] def spreadBy1(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Spread the low 21 bits of `c` so two more lanes fit between them
    * (Morton part1by2).
    */
  private[graft] def spreadBy2(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x1249249249249249L))
  }
}
