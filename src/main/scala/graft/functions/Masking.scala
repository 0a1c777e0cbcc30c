package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Medallion

/** The session principal's group list as a plan-time expression — the
  * engine's `IS_ACCOUNT_GROUP_MEMBER` analog (ref pii_masking.sql:26-31
  * embeds membership INSIDE the mask functions). Reads the session conf
  * `spark.graft.caller.groups` (comma-separated) and is FOLDABLE, so
  * ConstantFolding evaluates it ON THE DRIVER during optimization —
  * exactly how `current_user()`/`current_date()` bind: every query
  * through a governed view re-resolves the view text, re-folds this to
  * the CURRENT principal's literal, and the mask CASE then folds to
  * either the raw column or the mask — per-principal resolution with
  * ZERO runtime cost and full pushdown below the view. Registered as
  * `caller_groups()` by [[graft.GraftExtensions]] (a built-in, not a
  * temp function, so persistent views may reference it).
  */
case class CallerGroups()
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = org.apache.spark.unsafe.types.UTF8String.fromString(
    CallerGroups.canonical(org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.caller.groups", "")))
  override def prettyName: String = "caller_groups"
}

object CallerGroups {
  /** One canonical group-list form at the binding boundary, shared by
    * the foldable expression and the analysis-time rule: elements
    * trimmed, empties dropped, joined with bare commas. Without this,
    * a conf like `analysts, region-europe` (space after the comma)
    * evades BOTH the SQL row filter's `%,region-%` probe and
    * `memberSql`'s untrimmed split — the restricted principal would
    * see every region's rows (fail OPEN). Normalizing once where the
    * value is read keeps every downstream SQL/Scala consumer on the
    * same form.
    */
  def canonical(raw: String): String =
    raw.split(",").map(_.trim).filter(_.nonEmpty).mkString(",")
}

/** Analyzer rule binding `caller_groups()` to the current principal's
  * group-list literal at ANALYSIS time — Spark's `ReplaceCurrentLike`
  * shape for `current_user()`. Folding only in the optimizer
  * (foldable + ConstantFolding) is too late for one consumer: the
  * CacheManager matches cache entries on the canonicalized ANALYZED
  * plan, which would still carry the principal-independent
  * `CallerGroups()` node — a governed view cached under one principal
  * (`cache()` / CACHE TABLE) would then serve its rows to every other
  * principal. With the literal substituted during analysis, two
  * principals' plans never canonicalize equal, so caches are
  * per-principal by construction. The expression stays foldable as a
  * defense-in-depth fallback for sessions built without
  * [[graft.GraftExtensions]]'s resolution rule.
  */
case class BindCallerGroups(session: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    lazy val bound = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        CallerGroups.canonical(session.sessionState.conf
          .getConfString("spark.graft.caller.groups", ""))),
      org.apache.spark.sql.types.StringType)
    plan.transformUpWithSubqueries {
      case p => p.transformExpressions { case CallerGroups() => bound }
    }
  }
}

/** PII masking and row-level security — the reference's Unity Catalog
  * column masks / row filters (ref /root/reference/src/setup/
  * pii_masking.sql:26-103, apply_masks.sql) as plain Column functions.
  *
  * Group membership is a session-level parameter instead of
  * IS_ACCOUNT_GROUP_MEMBER(); masks are codegen-friendly string
  * expressions (no UDFs) so they fuse into whole-stage codegen. The
  * [[CallerGroups]] expression upgrades this to PER-PRINCIPAL dynamic
  * resolution through one stored view (see
  * [[graft.sources.CatalogSetup.bindGovernedCustomers]]).
  */
object Masking {

  /** Principal-aware mask-function body: privileged groups read the
    * raw value, everyone else the mask — the membership CASE lives
    * INSIDE the function, the reference's exact shape
    * (pii_masking.sql:26-37).
    */
  /** Exact element membership over the comma-separated group list —
    * the `IS_ACCOUNT_GROUP_MEMBER` contract. Substring contains()
    * would let a group NAMED 'admin-interns' or 'region-americas'
    * match 'admin' / a region group; split + array_contains tests
    * whole elements only (mirrors [[isPrivileged]]'s Set.contains).
    */
  private def memberSql(group: String): String =
    s"array_contains(split(caller_groups(), ','), '$group')"

  def govBody(maskBody: String): String =
    s"""CASE WHEN ${memberSql("admin")}
          OR ${memberSql("pii-readers")} THEN s
        ELSE ($maskBody) END"""

  /** Principal-aware row filter over `region_name`: privileged or
    * region-unrestricted principals see every row; a `region-*` group
    * member sees its regions (ref pii_masking.sql:80-103). The
    * "region-unrestricted" probe must test whole elements — a group
    * merely CONTAINING 'region-' as a substring is not a region grant
    * — AND it must fail CLOSED for region grants outside the known
    * universe: a principal whose only grant is `region-oceania`
    * carries a region restriction that maps to no rows, not to all
    * rows. Element-anchored LIKEs (list start / after a comma) detect
    * any `region-*` element without enumerating the universe, and the
    * whole filter still constant-folds per principal.
    */
  lazy val govRowFilterSql: String = {
    val sorted = RegionGroups.toSeq.sortBy(_._1)
    val perGroup = sorted.map { case (g, r) =>
      s"(${memberSql(g)} AND trim(region_name) = '$r')"
    }.mkString("\n        OR ")
    val anyRegionGroup =
      """(caller_groups() LIKE 'region-%'
          OR caller_groups() LIKE '%,region-%')"""
    s"""${memberSql("admin")}
        OR ${memberSql("pii-readers")}
        OR NOT $anyRegionGroup
        OR $perGroup"""
  }

  /** "Joao Silva" → "J*** Silva"; single-token names (no surname to
    * show) mask to "J***" — the reference's shape (pii_masking.sql:
    * 26-37) would leak the whole value through its last-word fallback.
    */
  def maskName(name: Column): Column =
    when(name.isNull, lit(null).cast("string"))
      .when(!name.contains(" "), concat(substring(name, 1, 1), lit("***")))
      .otherwise(concat(substring(name, 1, 1), lit("*** "),
        regexp_extract(name, "[^ ]*$", 0)))

  /** "joao.silva@gmail.com" → "jo****@gmail.com" (ref :44-55). */
  def maskEmail(email: Column): Column =
    when(email.isNull, lit(null).cast("string"))
      .otherwise(concat(substring(email, 1, 2), lit("****@"),
        regexp_extract(email, "[^@]*$", 0)))

  /** "+55 (11) 91234-5678" → "+55 (11) 9****-****" (ref :62-71). */
  def maskPhone(phone: Column): Column =
    when(phone.isNull, lit(null).cast("string"))
      .otherwise(concat(substring(phone, 1, 10), lit("****-****")))

  /** group → visible region, shared by the Column and SQL row filters. */
  val RegionGroups: Map[String, String] = Map(
    "region-africa" -> "AFRICA", "region-america" -> "AMERICA",
    "region-asia" -> "ASIA", "region-europe" -> "EUROPE",
    "region-middle-east" -> "MIDDLE EAST")

  def isPrivileged(groups: Set[String]): Boolean =
    groups.contains("admin") || groups.contains("pii-readers")

  /** Row filter (ref pii_masking.sql:80-103): which region a group may
    * see; groups with no region restriction see everything. A
    * `region-*` grant OUTSIDE the known universe fails CLOSED (zero
    * rows) — it is a restriction we cannot map, not an absence of one.
    */
  def regionFilter(regionName: Column, groups: Set[String]): Column = {
    if (isPrivileged(groups)) lit(true)
    else {
      val allowed = RegionGroups.collect {
        case (g, r) if groups.contains(g) => r
      }.toSeq
      if (!groups.exists(_.startsWith("region-")))
        lit(true) // unrestricted: all rows, masked PII
      else if (allowed.isEmpty) lit(false) // unknown region grant
      else trim(regionName).isin(allowed: _*)
    }
  }

  // ---- SQL twins -----------------------------------------------------------
  // The same masks/filter as Spark-SQL TEXT, for catalog binding
  // (CREATE FUNCTION / CREATE VIEW — the reference's pii_masking.sql +
  // apply_masks.sql shape). Kept beside the Column versions so the two
  // cannot drift unnoticed; the catalog gate hash-checks them against
  // the DuckDB oracle.

  /** Body of the `mask_name(s STRING)` SQL function. */
  val maskNameSqlBody: String =
    """CASE WHEN s IS NULL THEN NULL
       WHEN NOT contains(s, ' ') THEN substring(s, 1, 1) || '***'
       ELSE substring(s, 1, 1) || '*** ' || regexp_extract(s, '[^ ]*$', 0)
       END"""

  /** Body of the `mask_email(s STRING)` SQL function. */
  val maskEmailSqlBody: String =
    """CASE WHEN s IS NULL THEN NULL
       ELSE substring(s, 1, 2) || '****@' || regexp_extract(s, '[^@]*$', 0)
       END"""

  /** Body of the `mask_phone(s STRING)` SQL function. */
  val maskPhoneSqlBody: String =
    """CASE WHEN s IS NULL THEN NULL
       ELSE substring(s, 1, 10) || '****-****'
       END"""

  /** The row filter as a WHERE-clause fragment over `region_name`;
    * same fail-closed rule as [[regionFilter]] for unknown `region-*`
    * grants.
    */
  def regionFilterSql(groups: Set[String]): String =
    if (isPrivileged(groups)) "true"
    else {
      val allowed = RegionGroups.collect {
        case (g, r) if groups.contains(g) => r
      }.toSeq.sorted
      if (!groups.exists(_.startsWith("region-"))) "true"
      else if (allowed.isEmpty) "false"
      else s"trim(region_name) IN (${allowed.map(r => s"'$r'").mkString(", ")})"
    }

  /** Apply masks + row filter to the silver customers view, mimicking
    * ALTER TABLE … SET MASK / SET ROW FILTER for a given caller group
    * set (ref apply_masks.sql).
    */
  def maskedCustomers(customers: DataFrame, groups: Set[String]): DataFrame = {
    val privileged = groups.contains("admin") || groups.contains("pii-readers")
    def m(c: Column, masked: Column): Column = if (privileged) c else masked
    customers
      .filter(regionFilter(col("region_name"), groups))
      .select(
        col("customer_id"),
        m(col("customer_name"), maskName(col("customer_name"))).as("customer_name"),
        m(col("customer_email"), maskEmail(col("customer_email"))).as("customer_email"),
        m(col("customer_phone"), maskPhone(col("customer_phone"))).as("customer_phone"),
        col("mktsegment"), col("nation_name"), col("region_name"))
  }

  /** Analyst view (default group): all rows visible, PII masked. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_masked_customers" -> ((s, d) =>
      maskedCustomers(
        Medallion.silverCustomers(Tables.customer(s, d), Tables.nation(s, d),
          Tables.region(s, d)),
        groups = Set("analysts")).orderBy(col("customer_id"))))

  val maskedCustomersSql: String =
    """WITH sc AS (
         SELECT c_custkey AS customer_id,
           trim(c_name) AS customer_name,
           lower(trim(c_mktsegment)) AS mktsegment,
           trim(n_name) AS nation_name,
           trim(r_name) AS region_name,
           'c' || CAST(c_custkey AS VARCHAR) || '@example.com' AS customer_email,
           '+55 (11) 9' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             AS customer_phone
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
           AND length(trim(c_name)) > 0 AND c_nationkey IS NOT NULL)
       SELECT customer_id,
         CASE WHEN customer_name IS NULL THEN NULL
           WHEN NOT contains(customer_name, ' ')
             THEN substring(customer_name, 1, 1) || '***'
           ELSE substring(customer_name, 1, 1) || '*** '
             || regexp_extract(customer_name, '[^ ]*$') END AS customer_name,
         CASE WHEN customer_email IS NULL THEN NULL
           ELSE substring(customer_email, 1, 2) || '****@'
             || regexp_extract(customer_email, '[^@]*$') END AS customer_email,
         CASE WHEN customer_phone IS NULL THEN NULL
           ELSE substring(customer_phone, 1, 10) || '****-****' END AS customer_phone,
         mktsegment, nation_name, region_name
       FROM sc
       ORDER BY customer_id"""

  def oracles: Map[String, String] = Map(
    "pii_masked_customers" -> maskedCustomersSql)
}
