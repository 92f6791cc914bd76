package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation audit (X52) — the Deequ/Great-Expectations
  * shape: declarative per-column constraints evaluated over a table in as
  * few passes as the constraint algebra allows, reported as one row per
  * rule `(rule, n_rows, n_violations, passed)`. The ingestion gate a
  * production pipeline runs before committing a batch (and the batch
  * counterpart of a stream's schema enforcement).
  *
  * Scale shape: ALL scalar rules (null, range, regex, set-membership,
  * custom predicate) fold into ONE conditional-aggregate scan — no
  * shuffle, no per-rule pass. `Unique` adds one groupBy on its key
  * (map-side partial, count>1 groups only); `RefIntegrity` adds one
  * anti-join against the dimension (broadcast when small, the usual AQE
  * contract). Report size = number of rules, never data-sized.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Column must be non-null. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null:$column"
  }
  /** Numeric column within [lo, hi] (nulls are violations). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range:$column"
  }
  /** String column fully matches the regex (nulls are violations). */
  final case class Matches(column: String, regex: String) extends Rule {
    def name = s"matches:$column"
  }
  /** Column value in the allowed set (nulls are violations). */
  final case class OneOf(column: String, values: Seq[String]) extends Rule {
    def name = s"one_of:$column"
  }
  /** Arbitrary row predicate: violation where NOT satisfied / null. */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies:$label"
  }
  /** Key columns identify rows uniquely (each extra copy is a violation). */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique:${columns.mkString(",")}"
  }
  /** Every non-null value of `column` exists in `dim.dimCol` (orphan rows
    * are violations).
    */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimCol: String) extends Rule {
    def name = s"ref:$column"
  }

  private def violation(df: DataFrame, r: Rule): Column = r match {
    case NotNull(c)     => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNull || col(c) < lo || col(c) > hi
    case Matches(c, re) => !(col(c).rlike(s"^(?:$re)$$")) || col(c).isNull
    case OneOf(c, vs)   => !col(c).isin(vs: _*) || col(c).isNull
    case Satisfies(_, p) => !coalesce(p, lit(false))
    case _ => throw new IllegalArgumentException(s"not a scalar rule: $r")
  }

  /** Per-row scalar-rule verdicts: the input columns + `violations`
    * (comma-joined failed rule names in declaration order, "" when the
    * row is clean). SCALAR rules only — NotNull/InRange/Matches/OneOf/
    * Satisfies are row-local by definition; Unique and RefIntegrity need
    * relation context and belong in [[audit]]. One codegen'd projection,
    * no shuffle — the row-routing face of the audit (quarantine sinks,
    * dead-letter queues).
    */
  def flag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val scalars = rules.collect {
      case r @ (_: NotNull | _: InRange | _: Matches | _: OneOf |
                _: Satisfies) => r
    }
    require(scalars.size == rules.size,
      "flag takes scalar rules only (NotNull/InRange/Matches/OneOf/" +
        "Satisfies); Unique/RefIntegrity need relation context — use audit")
    df.withColumn("violations", concat_ws(",",
      scalars.map(r => when(violation(df, r), lit(r.name))): _*))
  }

  /** Functional-dependency profile: does `detCols →  depCols` hold —
    * the schema-discovery / ETL-integrity question ("does order key
    * determine supplier?", "does email determine account id?"). One row:
    * `n_keys`, `n_violating` (determinant values seen with more than one
    * distinct dependent combination), `max_variants` (the worst key's
    * distinct dependent count — 1 means the FD holds exactly).
    *
    * Scale shape: one distinct over (det, dep) then one grouped count on
    * det — both map-side-partial hash aggregations on the same key
    * family; output is one row.
    */
  def fdViolations(df: DataFrame, detCols: Seq[String],
                   depCols: Seq[String]): DataFrame = {
    require(detCols.nonEmpty && depCols.nonEmpty,
      "fdViolations needs determinant and dependent columns")
    require(detCols.intersect(depCols).isEmpty,
      s"determinant and dependent overlap: ${detCols.intersect(depCols)}")
    val variants = df
      .select((detCols ++ depCols).map(col): _*).distinct()
      .groupBy(detCols.map(col): _*)
      .agg(count(lit(1)).as("_nv"))
    variants.agg(count(lit(1)).as("n_keys"),
      count(when(col("_nv") > 1, 1)).as("n_violating"),
      max(col("_nv")).as("max_variants"))
  }

  /** Referential-integrity audit for one FK relation: ONE row
    * `(relation, n_child_rows, n_null_keys, n_orphans,
    * n_orphan_keys)` — child rows whose (non-null) key has no match in
    * the parent. NULL keys are counted separately, not as orphans (SQL
    * FK semantics: a NULL reference is absent, not dangling). The
    * per-relation rows of a multi-FK audit union cheaply.
    *
    * Scale shape: the child collapses to its key-DOMAIN count relation
    * first (map-side-combined), so the anti-join against the parent's
    * distinct keys runs on two key-domain-sized relations — never the
    * raw child.
    */
  def fkOrphans(child: DataFrame, childKeys: Seq[String],
                parent: DataFrame, parentKeys: Seq[String],
                relation: String): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      s"key arity mismatch: $childKeys vs $parentKeys")
    val notNull = childKeys.map(c => col(c).isNotNull).reduce(_ && _)
    val keyed = child.groupBy(childKeys.map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val nulls = keyed.filter(!notNull)
      .agg(coalesce(sum(col("_c")), lit(0L)).as("n_null_keys"))
    val parentK = parent
      .select(parentKeys.zip(childKeys).map { case (p, c) => col(p).as(c) }: _*)
      .distinct()
    val orphans = keyed.filter(notNull)
      .join(parentK, childKeys, "left_anti")
      .agg(coalesce(sum(col("_c")), lit(0L)).as("n_orphans"),
        count(lit(1)).as("n_orphan_keys"))
    // total child rows = Σ per-key counts — read off the SAME keyed
    // aggregation the other two branches reuse (exchange reuse dedupes
    // the subtree) instead of a third full child scan
    val totals = keyed.agg(coalesce(sum(col("_c")), lit(0L)).as("n_child_rows"))
    totals.crossJoin(nulls).crossJoin(orphans)
      .select(lit(relation).as("relation"), col("n_child_rows"),
        col("n_null_keys"), col("n_orphans"), col("n_orphan_keys"))
  }

  /** Route rows by the scalar rules: (clean rows with the ORIGINAL
    * schema, violating rows with the `violations` column attached).
    */
  def partition(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val f = flag(df, rules)
    (f.filter(col("violations") === "").select(df.columns.map(col): _*),
      f.filter(col("violations") =!= ""))
  }

  /** Evaluate `rules` over `df` → `(rule, n_rows, n_violations, passed)`,
    * one row per rule in declaration order.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val spark = df.sparkSession
    import spark.implicits._

    val scalars = rules.collect {
      case r @ (_: NotNull | _: InRange | _: Matches | _: OneOf |
                _: Satisfies) => r
    }
    // ONE action for the whole audit: the scalar conditional-sum scan,
    // each Unique groupBy and each RefIntegrity anti-join become 1-row
    // branches of a single union, so Spark schedules their stages
    // CONCURRENTLY inside one job instead of one synchronous
    // action-per-rule-family round trip (three sequential scans before).
    // Every branch emits (slot, n, viol); slot < 0 is the row-count
    // carrier used when no scalar pass runs.
    val parts = Seq.newBuilder[DataFrame]
    if (scalars.nonEmpty) {
      val aggs = count(lit(1)).as("_n") +:
        scalars.zipWithIndex.map { case (r, i) =>
          sum(when(violation(df, r), 1L).otherwise(0L)).as(s"_v$i")
        }
      parts += df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(scalars.zipWithIndex.map { case (_, i) =>
          struct(lit(i).as("slot"), col("_n").as("n"),
            coalesce(col(s"_v$i"), lit(0L)).as("viol"))
        }: _*)).as("_r"))
        .select(col("_r.slot"), col("_r.n"), col("_r.viol"))
    }
    val hasRef = rules.exists(_.isInstanceOf[RefIntegrity])
    if (scalars.isEmpty && hasRef) {
      // RefIntegrity reports n_rows; without a scalar pass, count in a
      // parallel branch of the same job rather than a separate scan
      parts += df.agg(count(lit(1)).as("n"))
        .select(lit(-1).as("slot"), col("n"), lit(0L).as("viol"))
    }
    // keyed rules live in slot space [scalars.size, …) so they can never
    // collide with the scalar slots [0, scalars.size)
    val keyedBase = scalars.size
    rules.zipWithIndex.foreach {
      case (Unique(cols), i) =>
        // each copy beyond the first is a violation; one narrow groupBy
        parts += df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(col("_c")), lit(0L)).as("n"),
            coalesce(sum(col("_c") - 1), lit(0L)).as("viol"))
          .select(lit(keyedBase + i).as("slot"), col("n"), col("viol"))
      case (RefIntegrity(c, dim, dimCol), i) =>
        parts += df.filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("viol"))
          .select(lit(keyedBase + i).as("slot"), lit(0L).as("n"), col("viol"))
      case _ => ()
    }
    val collected = parts.result().reduce(_ unionAll _).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val totalRows: Long =
      if (scalars.nonEmpty) collected(0)._1
      else collected.get(-1).map(_._1).getOrElse(0L)
    val scalarSlots = scalars.zipWithIndex.map { case (r, i) => r.name -> i }.toMap
    val report = rules.zipWithIndex.map {
      case (r: Unique, i) =>
        val (n, v) = collected(keyedBase + i)
        (r.name, n, v)
      case (r: RefIntegrity, i) =>
        (r.name, totalRows, collected(keyedBase + i)._2)
      case (r, _) =>
        val (n, v) = collected(scalarSlots(r.name))
        (r.name, n, v)
    }
    report.toDF("rule", "n_rows", "n_violations")
      .withColumn("passed", col("n_violations") === 0L)
  }
}
