package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Medallion

/** PII masking and row-level security — the reference's Unity Catalog
  * column masks / row filters (ref /root/reference/src/setup/
  * pii_masking.sql:26-103, apply_masks.sql) as plain Column functions.
  *
  * Group membership is a session-level parameter instead of
  * IS_ACCOUNT_GROUP_MEMBER(); masks are codegen-friendly string
  * expressions (no UDFs) so they fuse into whole-stage codegen.
  */
object Masking {

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
    * see; groups with no region restriction see everything.
    */
  def regionFilter(regionName: Column, groups: Set[String]): Column = {
    if (isPrivileged(groups)) lit(true)
    else {
      val allowed = RegionGroups.collect {
        case (g, r) if groups.contains(g) => r
      }.toSeq
      if (allowed.isEmpty) lit(true) // default: all rows, masked PII
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

  /** The row filter as a WHERE-clause fragment over `region_name`. */
  def regionFilterSql(groups: Set[String]): String =
    if (isPrivileged(groups)) "true"
    else {
      val allowed = RegionGroups.collect {
        case (g, r) if groups.contains(g) => r
      }.toSeq.sorted
      if (allowed.isEmpty) "true"
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
