package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row of the same
  * key with `rightTime <= leftTime`. Spark has no native ASOF JOIN (DuckDB
  * and kdb do); the naive formulation is a non-equi theta join that
  * Catalyst can only plan as a broadcast-nested-loop.
  *
  * This implementation is the scalable union+window form:
  *
  *   1. tag left (1) and right (0) rows, union them (right's payload
  *      columns carried as one struct, null on left rows);
  *   2. one window per key ordered by (time, tag): running
  *      `last(payload, ignoreNulls)` carries the latest right payload
  *      forward onto every subsequent left row — right rows sort before
  *      left rows at equal times, giving inclusive (<=) semantics;
  *   3. keep the left rows, unpack the carried struct.
  *
  * Cost: ONE shuffle of (left ∪ right) on the key — same exchange count as
  * an ordinary equi-join, no theta-join blowup, no driver materialization.
  * Right side must be unique per (key, time); pre-aggregate it otherwise
  * (enforced here with a deterministic `max` struct pick, mirroring the
  * MERGE dup-key discipline).
  */
object AsofJoin {

  /** Left as-of join. Right payload columns are appended to every left row
    * (null where no right row matches).
    *
    * @param leftKey / rightKey equi-key columns
    * @param leftTime / rightTime event-time columns (same type)
    * @param direction "backward" (default): most recent right row with
    *        `rightTime <= leftTime`; "forward": earliest right row with
    *        `rightTime >= leftTime` — pandas merge_asof's direction knob.
    * @param tolerance maximum allowed |leftTime − matchedRightTime|, in the
    *        units of `cast(time as long)` (seconds for timestamps); a match
    *        farther away yields nulls, same as no match.
    */
  def leftAsof(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    require(!payloadCols.contains("_asof_rt"), "_asof_rt is reserved")

    // unique (key, time) on the right: deterministic max-struct survivor;
    // the matched right TIME rides in the payload for the tolerance check.
    // NULL-time right rows can never be "as of" anything — dropped (they
    // would otherwise sort to an ordering edge and pollute the carry).
    val rightUnique = right
      .filter(col(rightTime).isNotNull)
      .groupBy(col(rightKey), col(rightTime))
      .agg(max(struct((col(rightTime).as("_asof_rt") +: payloadCols.map(col)): _*))
        .as("_asof_payload"))

    val K = "_asof_key"; val T = "_asof_t"; val TAG = "_asof_tag"; val P = "_asof_payload"
    val taggedLeft = left
      .withColumn(K, col(leftKey)).withColumn(T, col(leftTime))
      .withColumn(TAG, lit(1)).withColumn(P,
        lit(null).cast(rightUnique.schema(P).dataType))
    val taggedRight = rightUnique.select(
      col(rightKey).as(K), col(rightTime).as(T), lit(0).as(TAG), col(P))
      // left columns become null on right rows
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right rows sort before left rows at equal times in BOTH directions
    // (TAG ascending), giving inclusive semantics
    val ordering =
      if (direction == "backward") Seq(col(T).asc, col(TAG).asc)
      else Seq(col(T).desc, col(TAG).asc)
    val w = Window.partitionBy(col(K)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(P, last(col(P), ignoreNulls = true).over(w))

    // NULL-time LEFT rows match nothing in either direction (desc ordering
    // would otherwise sort them after every right row and hand them a
    // spurious carried payload in forward mode)
    val matchOk = tolerance match {
      case None => col(T).isNotNull && col(P).isNotNull
      case Some(tol) =>
        val diff =
          if (direction == "backward")
            col(T).cast("timestamp").cast("long") -
              col(s"$P._asof_rt").cast("timestamp").cast("long")
          else col(s"$P._asof_rt").cast("timestamp").cast("long") -
            col(T).cast("timestamp").cast("long")
        col(T).isNotNull && col(P).isNotNull && diff <= tol
    }
    carried.filter(col(TAG) === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => when(matchOk, col(s"$P.$c")).as(c)): _*)
  }

  /** pandas merge_asof `direction="nearest"`: the right row CLOSEST in
    * time on either side (ties break backward — the earlier row). Both
    * directional carries are computed over the SAME union in one
    * key-partitioned exchange (two window sorts, one shuffle); the
    * per-row choice is then a scalar comparison of the two carried
    * match times. `tolerance` bounds |leftTime − matchedTime| as in
    * [[leftAsof]].
    */
  def leftAsofNearest(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      tolerance: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    require(!payloadCols.contains("_asof_rt"), "_asof_rt is reserved")
    val rightUnique = right
      .filter(col(rightTime).isNotNull)
      .groupBy(col(rightKey), col(rightTime))
      .agg(max(struct((col(rightTime).as("_asof_rt") +: payloadCols.map(col)): _*))
        .as("_asof_payload"))
    val K = "_asof_key"; val T = "_asof_t"; val TAG = "_asof_tag"; val P = "_asof_payload"
    val taggedLeft = left
      .withColumn(K, col(leftKey)).withColumn(T, col(leftTime))
      .withColumn(TAG, lit(1)).withColumn(P,
        lit(null).cast(rightUnique.schema(P).dataType))
    val taggedRight = rightUnique.select(
      col(rightKey).as(K), col(rightTime).as(T), lit(0).as(TAG), col(P))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val wB = Window.partitionBy(col(K)).orderBy(col(T).asc, col(TAG).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(K)).orderBy(col(T).desc, col(TAG).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_pb", last(col(P), ignoreNulls = true).over(wB))
      .withColumn("_pf", last(col(P), ignoreNulls = true).over(wF))
    val tol = tolerance.map(lit(_)).getOrElse(lit(Long.MaxValue))
    // NTZ time columns cannot cast straight to long — route through
    // TimestampType (session TZ is the caller's concern; UTC here)
    def secs(c: org.apache.spark.sql.Column) =
      c.cast("timestamp").cast("long")
    val db = secs(col(T)) - secs(col("_pb._asof_rt"))
    val dfw = secs(col("_pf._asof_rt")) - secs(col(T))
    val validB = col(T).isNotNull && col("_pb").isNotNull && db <= tol
    val validF = col(T).isNotNull && col("_pf").isNotNull && dfw <= tol
    val chosen = when(validB && (!validF || db <= dfw), col("_pb"))
      .when(validF, col("_pf"))
    carried.filter(col(TAG) === 1)
      .withColumn("_pc", chosen)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"_pc.$c").as(c)): _*)
  }
}
