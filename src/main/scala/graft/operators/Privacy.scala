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
    * residual_rows, vacuumed, resumed)` where residual_rows is a
    * post-delete verification count (must be 0; emitted rather than
    * asserted so the audit trail records the check itself) and
    * `vacuumed` records IN THE AUDIT ITSELF whether old versions were
    * reclaimed — a compliance reviewer reading the record must not have
    * to consult scaladoc to learn the subject is still time-travel-
    * recoverable when it is false.
    *
    * ERASURE IS NOT COMPLETE UNTIL OLD VERSIONS ARE RECLAIMED: time
    * travel to a pre-deletion version resurrects the subject. With
    * `vacuumNow = true` each table is vacuumed to its newest version in
    * the same call (destroys time travel — the compliance trade);
    * otherwise schedule `vacuum()` before the erasure deadline.
    *
    * CRASH SAFETY: each table's delete is one atomic commit, but the
    * CASCADE spans tables, and a crash between commits would otherwise
    * leave a half-applied erasure nothing replays. Pass `journalDir` to
    * make the cascade resumable: before each table's delete an intent
    * record (with the pre-delete row count) is persisted via atomic
    * create, and after the commit a done record (the audit row). A
    * re-run of the SAME call (same journalDir, subject, tables) skips
    * tables whose done record exists — their audit rows replay from the
    * journal verbatim — and for a table that crashed between delete and
    * done-record the original intent count reconstructs `rows_deleted`
    * exactly (deleteWhere on an already-erased subject commits nothing
    * and returns the current version), so the combined audit is
    * exactly-once per table no matter where the crash landed. Rows
    * completed on an earlier attempt carry `resumed = true`.
    */
  def forgetSubject(tables: Seq[(VersionedTable, String)], subject: Any,
                    vacuumNow: Boolean = false,
                    journalDir: Option[String] = None): DataFrame = {
    require(tables.nonEmpty, "forgetSubject needs at least one table")
    val spark = tables.head._1.read.sparkSession
    import spark.implicits._
    val journal = journalDir.map(d => new ErasureJournal(spark, d, subject))
    val audit = tables.zipWithIndex.map { case ((t, keyCol), idx) =>
      journal.flatMap(_.readDone(idx, t.root)) match {
        case Some(done) => done.copy(resumed = true)
        case None =>
          // deleteWhere returns the committed VERSION; the deleted-row
          // count is measured against the INTENT-time count (journaled
          // before the delete) so a crash between the table commit and
          // the done record cannot lose it — post-crash the live count
          // is already 0 and only the journal still knows `before`
          val live = t.read.filter(col(keyCol) === lit(subject)).count()
          val before = journal match {
            case Some(j) => j.writeStartOnce(idx, t.root, live)
            case None => live
          }
          val newVersion = t.deleteWhere(col(keyCol) === lit(subject))
          val vacuumed = if (vacuumNow) { t.vacuum(retainLast = 1); true }
                         else false
          val residual = t.read.filter(col(keyCol) === lit(subject)).count()
          val rec = ErasureRecord(t.root, keyCol, before - residual,
            newVersion, residual, vacuumed, resumed = false)
          journal.foreach(_.writeDone(idx, rec))
          rec
      }
    }
    audit.toDF.select(col("tableRoot").as("table_root"),
      col("keyCol").as("key_col"), col("rowsDeleted").as("rows_deleted"),
      col("newVersion").as("new_version"),
      col("residualRows").as("residual_rows"), col("vacuumed"),
      col("resumed"))
  }

  /** One table's completed erasure step, as journaled and audited. */
  case class ErasureRecord(tableRoot: String, keyCol: String,
                           rowsDeleted: Long, newVersion: Long,
                           residualRows: Long, vacuumed: Boolean,
                           resumed: Boolean)

  /** Durable per-(subject, table-index) erasure progress: one tiny file
    * per step under `dir/forget_<md5(subject)>/`, each published by
    * atomic create-no-overwrite (`<idx>.start` = intent + pre-delete
    * count, written BEFORE the table commit; `<idx>.done` = the full
    * audit row, written after). File-per-step instead of an appended log
    * because atomic append is not portable across HDFS/object stores,
    * while exclusive create is the same primitive VersionedTable's
    * commit claim already relies on.
    */
  private final class ErasureJournal(spark: org.apache.spark.sql.SparkSession,
                                     dir: String, subject: Any) {
    private val subjectTag = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(String.valueOf(subject).getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString.take(16)
    }
    private val base = new org.apache.hadoop.fs.Path(dir, s"forget_$subjectTag")
    private val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def readFile(p: org.apache.hadoop.fs.Path): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      }

    /** Create-no-overwrite publish; a losing racer reads the winner's
      * content back so both sides proceed from one truth.
      */
    private def createOnce(p: org.apache.hadoop.fs.Path,
                           content: String): String = {
      fs.mkdirs(base)
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        content
      } catch {
        case _: java.io.IOException =>
          readFile(p).getOrElse(
            throw new java.io.IOException(s"journal claim lost and $p unreadable"))
      }
    }

    /** Journal intent for step `idx` (pre-delete count) if not already
      * journaled; returns the AUTHORITATIVE count — the first attempt's
      * on a resume, when the live count may already read 0.
      */
    def writeStartOnce(idx: Int, tableRoot: String, before: Long): Long = {
      val p = new org.apache.hadoop.fs.Path(base, f"$idx%04d.start")
      val won = createOnce(p, s"$tableRoot\n$before")
      val lines = won.split("\n", 2)
      require(lines(0) == tableRoot,
        s"erasure journal step $idx was started for table ${lines(0)}, " +
          s"but this cascade names $tableRoot — table lists must match " +
          "across resume attempts")
      lines(1).trim.toLong
    }

    def writeDone(idx: Int, rec: ErasureRecord): Unit = {
      val p = new org.apache.hadoop.fs.Path(base, f"$idx%04d.done")
      createOnce(p, Seq(rec.tableRoot, rec.keyCol, rec.rowsDeleted,
        rec.newVersion, rec.residualRows, rec.vacuumed).mkString("\n"))
    }

    def readDone(idx: Int, tableRoot: String): Option[ErasureRecord] =
      readFile(new org.apache.hadoop.fs.Path(base, f"$idx%04d.done")).map { s =>
        val f = s.split("\n")
        require(f(0) == tableRoot,
          s"erasure journal step $idx completed for table ${f(0)}, but " +
            s"this cascade names $tableRoot — table lists must match " +
            "across resume attempts")
        ErasureRecord(f(0), f(1), f(2).toLong, f(3).toLong, f(4).toLong,
          f(5).toBoolean, resumed = false)
      }
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
    // ALL levels checked in ONE job instead of one sequential
    // risky-isEmpty action per level: explode the (domain-sized) base
    // across the ≤ maxLevel+1 levels, aggregate per (level, class), and
    // count each level's (k, l) violations — the chosen level is the
    // smallest with zero, exactly the old per-level loop's fixpoint
    val riskyPerLevel = base
      .withColumn("_lvl", explode(sequence(lit(0), lit(maxLevel))))
      .groupBy(col("_lvl") +: qis :+
        expr("shiftright(_b0, _lvl)").as("qi_bucket"): _*)
      .agg(sum(col("_cnt")).as("class_size"),
        countDistinct(col("_s")).as("l_diversity"))
      .groupBy(col("_lvl"))
      .agg(count(when(col("class_size") < k || col("l_diversity") < l, 1))
        .as("_risky"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chosen = (0 to maxLevel).find(lv => riskyPerLevel.getOrElse(lv, 0L) == 0L)
    chosen match {
      case Some(level) => (level, classesAt(level))
      case None => (-1, classesAt(maxLevel))
    }
  }
}
