package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.storage.VersionedTable

/** Privacy audits for training-data governance: k-anonymity /
  * l-diversity over quasi-identifier (QI) columns, plus the minimal
  * numeric generalization that satisfies them. A QI equivalence class
  * smaller than k re-identifies its members by linkage; a class whose
  * sensitive attribute takes fewer than l distinct values leaks it even
  * at k — both are standard pre-release checks on any dataset carrying
  * user-derived columns (the reference pipeline's data is public sensor
  * readings, but the engine's users' corpora are not).
  *
  * Scale shape: ONE row-scale aggregation to the finest
  * (QI × sensitive) distinct-pair relation with multiplicities; every
  * generalization level then re-aggregates that DOMAIN-sized relation
  * (classes × sensitive values), never the rows — the lattice search is
  * a bounded driver loop over domain-sized jobs. The numeric QI
  * generalizes by arithmetic right-shift (bucket width 2^level), which
  * is floor division in BOTH engines (ANSI-replayable on negatives,
  * unlike float floor-divide).
  */
object Privacy {

  /** Right-to-erasure (GDPR Art. 17 / CCPA) cascade: delete every row
    * keyed to `subject` across the given (table, keyCol) pairs — one
    * atomic versioned commit per table, zone-map-pruned part rewrites
    * only ([[VersionedTable.deleteWhere]]) — and return an audit
    * relation `(table_root, key_col, rows_deleted, new_version,
    * residual_rows)` where residual_rows is a post-delete verification
    * count (must be 0; emitted rather than asserted so the audit trail
    * records the check itself).
    *
    * ERASURE IS NOT COMPLETE UNTIL OLD VERSIONS ARE RECLAIMED: time
    * travel to a pre-deletion version resurrects the subject. With
    * `vacuumNow = true` each table is vacuumed to its newest version in
    * the same call (destroys time travel — the compliance trade);
    * otherwise schedule `vacuum()` before the erasure deadline.
    */
  def forgetSubject(tables: Seq[(VersionedTable, String)], subject: Any,
                    vacuumNow: Boolean = false): DataFrame = {
    require(tables.nonEmpty, "forgetSubject needs at least one table")
    val spark = tables.head._1.read.sparkSession
    import spark.implicits._
    val audit = tables.map { case (t, keyCol) =>
      // deleteWhere returns the committed VERSION; the deleted-row count
      // is measured as before − residual so the audit never trusts a
      // side channel
      val before = t.read.filter(col(keyCol) === lit(subject)).count()
      val newVersion = t.deleteWhere(col(keyCol) === lit(subject))
      if (vacuumNow) t.vacuum(retainLast = 1)
      val residual = t.read.filter(col(keyCol) === lit(subject)).count()
      (t.root, keyCol, before - residual, newVersion, residual)
    }
    audit.toDF("table_root", "key_col", "rows_deleted", "new_version",
      "residual_rows")
  }

  /** Per-class k-anonymity / l-diversity audit at a fixed generalization
    * level: groups by the categorical QIs plus `shiftright(floor(numCol),
    * level)` and returns one row per class with `class_size` and
    * `l_diversity` (distinct sensitive values). Rows with NULL in any QI
    * or the sensitive column are excluded (they form no linkable class).
    */
  def kAnonymityClasses(df: DataFrame, qiCatCols: Seq[String],
                        qiNumCol: String, sensitiveCol: String,
                        level: Int): DataFrame = {
    require(level >= 0 && level < 63, s"level=$level")
    val qis = qiCatCols.map(col)
    val keep = (qiCatCols :+ qiNumCol :+ sensitiveCol)
      .map(c => col(c).isNotNull).reduce(_ && _)
    df.filter(keep)
      .groupBy(qis :+ shiftright(floor(col(qiNumCol)).cast("long"), level)
        .as("qi_bucket"): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
  }

  /** Minimal-generalization search: the smallest `level` in
    * [0, maxLevel] whose every class has `class_size ≥ k` AND
    * `l_diversity ≥ l` — i.e. the least-coarse bucketing of the numeric
    * QI that makes the dataset releasable under (k, l). Returns
    * `(chosen_level, classes)` where classes is the audit relation AT
    * that level; `chosen_level = -1` (with the maxLevel classes as the
    * risk audit) when even the coarsest level fails.
    *
    * The search aggregates rows ONCE to the finest (QI, bucket0,
    * sensitive) pair relation and derives every level from it: class
    * size is `sum(cnt)`, l-diversity a distinct count over the pair
    * relation — each level's check is one job over the class domain.
    */
  def minimalGeneralization(df: DataFrame, qiCatCols: Seq[String],
                            qiNumCol: String, sensitiveCol: String,
                            k: Long, l: Long,
                            maxLevel: Int = 16): (Int, DataFrame) = {
    require(k >= 1 && l >= 1, s"k=$k l=$l")
    require(maxLevel >= 0 && maxLevel < 63, s"maxLevel=$maxLevel")
    val qis = qiCatCols.map(col)
    val keep = (qiCatCols :+ qiNumCol :+ sensitiveCol)
      .map(c => col(c).isNotNull).reduce(_ && _)
    // the one row-scale pass: distinct (QI, finest bucket, sensitive)
    // pairs with row multiplicities — domain-sized, cut from the lineage
    val base = df.filter(keep)
      .groupBy(qis :+ floor(col(qiNumCol)).cast("long").as("_b0") :+
        col(sensitiveCol).as("_s"): _*)
      .agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true)
    def classesAt(level: Int): DataFrame =
      base.groupBy(qis :+ shiftright(col("_b0"), level).as("qi_bucket"): _*)
        .agg(sum(col("_cnt")).as("class_size"),
          countDistinct(col("_s")).as("l_diversity"))
    var level = 0
    while (level <= maxLevel) {
      val risky = classesAt(level)
        .filter(col("class_size") < k || col("l_diversity") < l)
      if (risky.isEmpty) return (level, classesAt(level))
      level += 1
    }
    (-1, classesAt(maxLevel))
  }
}
