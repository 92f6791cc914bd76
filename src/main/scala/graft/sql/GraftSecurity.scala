package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.storage.VersionedTable

/** Role-based access control for a graft catalog root — Snowflake GRANT
  * parity (reference `templates/table_grants.sql.j2:13-27`: `USE ROLE`,
  * `GRANT CREATE TABLE ON SCHEMA`, `GRANT INSERT,UPDATE ON TABLE`),
  * re-expressed for a single-process engine:
  *
  *  - roles + grants persist in a `_GRANTS` versioned table under the
  *    catalog root (same commit mechanics as `_TASKS`, so security changes
  *    are atomic, versioned, and time-travelable like any other state);
  *  - `USE ROLE r` ≙ `SET spark.graft.role = r` (session conf — each
  *    Spark session carries its own active role);
  *  - no active role, or role ACCOUNTADMIN, bypasses every check (open
  *    mode — the admin context that runs DDL/grants, and the default for
  *    embedded use where the process owner owns the data);
  *  - privileges: SELECT, INSERT, UPDATE, DELETE, OWNERSHIP (drop/alter),
  *    CREATE TABLE (namespace-scoped), ALL (= the four DML privileges);
  *  - targets: `NS.TABLE`, `NS.*` (schema grant), `*` (account grant) —
  *    matched case-insensitively, most-specific not required (any match
  *    admits).
  *
  * Scale shape: enforcement reads are metadata-only — the grants table
  * collects once per committed version (one tiny driver-cached read; the
  * per-statement check is a commit-log version probe + an in-memory set
  * scan), so a 100 TB query pays nanoseconds for authorization.
  */
final class GraftSecurity(root: String) {
  import GraftSecurity._

  private def grantsVt(spark: SparkSession): VersionedTable =
    VersionedTable(spark, s"$root/_GRANTS", collectStats = false)

  /** (version, roles, grants) — re-collected only when `_GRANTS` commits. */
  @volatile private var cache: (Long, Set[String], Seq[Grant]) =
    (-1L, Set.empty, Seq.empty)

  private def load(spark: SparkSession): (Set[String], Seq[Grant]) = {
    val vt = grantsVt(spark)
    val state = vt.state
    if (state.isEmpty) return (Set.empty, Seq.empty)
    val v = state.get.version
    val c = cache
    if (c._1 == v) return (c._2, c._3)
    val rows = vt.read.collect()
    val roles = rows.collect {
      case r if r.getString(1) == RoleMarker => r.getString(0)
    }.toSet
    val grants = rows.collect {
      case r if r.getString(1) != RoleMarker =>
        Grant(r.getString(0), r.getString(1), r.getString(2))
    }.toSeq
    cache = (v, roles, grants)
    (roles, grants)
  }

  /** The session's active non-admin role, if enforcement applies. */
  def currentRole(spark: SparkSession): Option[String] =
    spark.conf.getOption(RoleConf).map(_.trim.toUpperCase)
      .filter(r => r.nonEmpty && r != "ACCOUNTADMIN")

  /** Enforce `priv` on `ns.name` for the active role (no-op in admin /
    * no-role mode). Throws SecurityException naming role, privilege, and
    * object — the loud Snowflake "not authorized" failure.
    */
  def requirePriv(spark: SparkSession, priv: String,
                  ns: Seq[String], name: String): Unit =
    currentRole(spark).foreach { role =>
      val (roles, grants) = load(spark)
      if (!roles.contains(role))
        throw new SecurityException(
          s"role '$role' (from $RoleConf) does not exist; " +
            "CALL system.create_role first")
      val tgt = (ns :+ name).map(_.toUpperCase).mkString(".")
      val nsStar = (ns.map(_.toUpperCase) :+ "*").mkString(".")
      val p = priv.toUpperCase
      val ok = grants.exists { g =>
        g.role == role &&
          (g.priv == p || (g.priv == "ALL" && DmlPrivs.contains(p))) &&
          (g.target == "*" || g.target == tgt || g.target == nsStar)
      }
      if (!ok)
        throw new SecurityException(
          s"role '$role' is not authorized: $p on $tgt requires " +
            s"GRANT (CALL system.grant_privilege(role => '$role', " +
            s"privilege => '$p', on => '$tgt'))")
    }

  /** Security DDL (create/drop role, grant/revoke) is admin-only. */
  def requireAdmin(spark: SparkSession, op: String): Unit =
    currentRole(spark).foreach { role =>
      throw new SecurityException(
        s"$op requires the admin context; active role is '$role' " +
          s"(unset $RoleConf or SET $RoleConf = ACCOUNTADMIN)")
    }

  def createRole(spark: SparkSession, role: String): Unit = {
    requireAdmin(spark, "create_role")
    val r = normRole(role)
    val (roles, grants) = load(spark)
    require(!roles.contains(r), s"role '$r' already exists")
    write(spark, rows(roles + r, grants))
  }

  /** Dropping a role also drops its grants (Snowflake cascades). */
  def dropRole(spark: SparkSession, role: String): Unit = {
    requireAdmin(spark, "drop_role")
    val r = normRole(role)
    val (roles, grants) = load(spark)
    require(roles.contains(r), s"role '$r' does not exist")
    write(spark, rows(roles - r, grants.filterNot(_.role == r)))
  }

  def grant(spark: SparkSession, role: String, priv: String,
            target: String): Unit = {
    requireAdmin(spark, "grant_privilege")
    val r = normRole(role)
    val p = normPriv(priv)
    val t = target.trim.toUpperCase
    require(t.nonEmpty, "grant target must be non-empty")
    val (roles, grants) = load(spark)
    require(roles.contains(r), s"role '$r' does not exist; create_role first")
    val g = Grant(r, p, t)
    if (!grants.contains(g)) write(spark, rows(roles, grants :+ g))
  }

  def revoke(spark: SparkSession, role: String, priv: String,
             target: String): Unit = {
    requireAdmin(spark, "revoke_privilege")
    val g = Grant(normRole(role), normPriv(priv), target.trim.toUpperCase)
    val (roles, grants) = load(spark)
    require(grants.contains(g),
      s"no such grant: ${g.priv} on ${g.target} to role ${g.role}")
    write(spark, rows(roles, grants.filterNot(_ == g)))
  }

  /** All grants, or one role's (SHOW GRANTS [TO ROLE r] parity). */
  def showGrants(spark: SparkSession, role: Option[String]): Seq[Grant] = {
    val (_, grants) = load(spark)
    role.map(normRole).fold(grants)(r => grants.filter(_.role == r))
  }

  def listRoles(spark: SparkSession): Seq[String] =
    load(spark)._1.toSeq.sorted

  private def normRole(role: String): String = {
    val r = role.trim.toUpperCase
    require(r.nonEmpty && r != "ACCOUNTADMIN",
      s"invalid role name '$role' (non-empty, ACCOUNTADMIN is reserved)")
    r
  }

  private def normPriv(priv: String): String = {
    val p = priv.trim.toUpperCase
    require(AllPrivs.contains(p),
      s"unknown privilege '$priv' (one of ${AllPrivs.mkString(", ")})")
    p
  }

  private def rows(roles: Set[String], grants: Seq[Grant]): Seq[Row] =
    roles.toSeq.sorted.map(r => Row(r, RoleMarker, "")) ++
      grants.map(g => Row(g.role, g.priv, g.target))

  private def write(spark: SparkSession, rs: Seq[Row]): Unit = {
    import scala.jdk.CollectionConverters._
    grantsVt(spark).overwrite(
      spark.createDataFrame(rs.asJava, GrantsSchema))
  }
}

object GraftSecurity {
  /** `SET spark.graft.role = <r>` ≙ Snowflake `USE ROLE <r>`. */
  val RoleConf = "spark.graft.role"
  private val RoleMarker = "--ROLE--"
  private val DmlPrivs = Set("SELECT", "INSERT", "UPDATE", "DELETE")
  private val AllPrivs =
    DmlPrivs ++ Set("ALL", "OWNERSHIP", "CREATE TABLE")

  final case class Grant(role: String, priv: String, target: String)

  private val GrantsSchema = StructType(Seq(
    StructField("ROLE", StringType, nullable = false),
    StructField("PRIVILEGE", StringType, nullable = false),
    StructField("TARGET", StringType, nullable = false)))
}
