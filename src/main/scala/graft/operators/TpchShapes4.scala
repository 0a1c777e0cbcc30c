package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Fourth decision-support tranche: the four TPC-H shapes the earlier
  * tranches left out (Q2 / Q11 / Q16 / Q20), each adapted to the
  * testdata schema. There is no partsupp table, so the part-supplier
  * relation is DERIVED from lineitem (which pairs actually traded) —
  * the join/subquery SHAPE of each query is preserved:
  *
  *  - Q2: correlated minimum over the derived relation (window min per
  *    part after the region restriction), top-100 under a total order.
  *  - Q11: group aggregate compared against a global scalar aggregate
  *    (the one-row broadcast crossJoin pattern, §3-exact decimals).
  *  - Q16: anti-join supplier exclusion + COUNT(DISTINCT) per group.
  *  - Q20: two stacked correlated aggregates (pair share vs part
  *    total), all-integral decimal arithmetic so the comparison is
  *    exact in both engines.
  *
  * Scale: every dimension (part slice, supplier⋈nation⋈region, the
  * negative-balance exclusion list) broadcasts; the only fact-scale
  * shuffles are the derived-pair groupBys, keyed so the per-part
  * reduction reuses the pair partitioning's first component where the
  * planner can. Nothing is O(n²).
  */
object TpchShapes4 {

  /** Pair → cheapest observed unit price (MIN over doubles is
    * order-independent, so safe in compared output per §3.1).
    */
  private def derivedPartSupp(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))

  private def regionSuppliers(supplier: DataFrame, nation: DataFrame,
      region: DataFrame, rName: String): DataFrame =
    supplier.join(broadcast(nation),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === rName)),
        col("n_regionkey") === col("r_regionkey"))

  // ---- Q2: min-cost supplier per part --------------------------------------

  val Q2Region = "EUROPE"
  val Q2Type = "STANDARD"
  val Q2MaxSize = 10

  /** For each STANDARD small-size part, the EUROPE supplier(s) whose
    * derived cost equals the part's minimum over EUROPE suppliers —
    * Q2's correlated scalar subquery, expressed as a window MIN
    * partitioned by part over the already-restricted pairs (one extra
    * shuffle on p_partkey; the correlated subquery would rescan). The
    * part slice and the supplier chain both broadcast into the pair
    * relation, so the fact is scanned once.
    */
  def q2MinCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame)
      : DataFrame = {
    val p = part
      .filter(col("p_type") === Q2Type && col("p_size") <= Q2MaxSize)
      .select(col("p_partkey"), col("p_name"))
    val eu = regionSuppliers(supplier, nation, region, Q2Region)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val pairs = derivedPartSupp(lineitem)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
    val minCost = min(col("cost")).over(Window.partitionBy(col("p_partkey")))
    pairs.withColumn("min_cost", minCost)
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    s"""WITH ps AS (
         SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
         FROM lineitem GROUP BY 1, 2)
       SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
       FROM ps
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = '$Q2Region' AND p_type = '$Q2Type'
         AND p_size <= $Q2MaxSize
       QUALIFY cost = min(cost) OVER (PARTITION BY p_partkey)
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       LIMIT 100"""

  // ---- Q11: important part values ------------------------------------------

  val Q11Region = "ASIA"
  val Q11MeanMultiple = 2 // part qualifies when value > 2 × mean value

  /** Part value (revenue through $Q11Region suppliers) filtered against
    * a multiple of the MEAN part value — Q11's HAVING-over-scalar-
    * subquery, made scale-free (a fixed fraction of the total empties
    * out as the part count grows; a mean multiple keeps a stable
    * slice at every SF). The (total, count) pair is a one-row broadcast
    * crossJoin (the repo's sanctioned scalar pattern); the comparison
    * `v·n > k·total` is multiplied out so it is decimal×integer — no
    * division, exact in both engines.
    */
  def q11ImportantParts(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val sup = regionSuppliers(supplier, nation, region, Q11Region)
      .select(col("s_suppkey"))
    val value = lineitem
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).as("v"))
    val total = value.agg(sum(col("v")).as("total"),
      count(lit(1)).as("n_parts"))
    value.crossJoin(broadcast(total))
      .filter(col("v") * col("n_parts") >
        col("total") * lit(Q11MeanMultiple))
      .select(col("p_partkey"), col("v").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    s"""WITH val AS (
         SELECT l_partkey AS p_partkey,
           SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,4))) AS v
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = '$Q11Region'
         GROUP BY 1)
       SELECT p_partkey, CAST(v AS DOUBLE) AS part_value
       FROM val
       WHERE v * (SELECT COUNT(*) FROM val) >
         (SELECT SUM(v) FROM val) * $Q11MeanMultiple
       ORDER BY part_value DESC, p_partkey"""

  // ---- Q16: supplier counts by part descriptor -----------------------------

  val Q16ExcludedBrand = "Brand#3"
  val Q16ExcludedTypePrefix = "PROMO"
  val Q16Sizes: Seq[Int] = Seq(1, 4, 7, 10, 13, 16, 19, 22)

  /** Distinct supplier count per (brand, type, size) over the derived
    * pair relation, excluding one brand / one type family / off-list
    * sizes and — Q16's NOT IN — suppliers with a negative balance, as
    * a broadcast anti-join.
    */
  def q16SupplierCounts(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame = {
    val p = part.filter(col("p_brand") =!= Q16ExcludedBrand &&
        !col("p_type").startsWith(Q16ExcludedTypePrefix) &&
        col("p_size").isin(Q16Sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    val excluded = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p_brand, p_type, p_size,
         COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM ps JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> '$Q16ExcludedBrand'
         AND p_type NOT LIKE '$Q16ExcludedTypePrefix%'
         AND p_size IN (${Q16Sizes.mkString(", ")})
         AND l_suppkey NOT IN
           (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // ---- Q20: suppliers with above-average part share ------------------------

  val Q20NamePrefix = "small"
  val Q20Region = "AMERICA"
  val Q20Year = 1997

  /** Suppliers in $Q20Region who, for some '$Q20NamePrefix%' part,
    * shipped more than half the average per-supplier quantity of that
    * part in $Q20Year — Q20's nested correlated aggregates. The share
    * test `qty > part_qty / (2·n_sup)` is multiplied out to
    * `2·qty·n_sup > part_qty` so it is all-integral decimal arithmetic
    * (quantities are integral; counts are BIGINT) and therefore exact
    * in both engines. Part keys and the region supplier list
    * broadcast; the per-part totals broadcast back onto the pairs.
    */
  def q20QualifiedSuppliers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame)
      : DataFrame = {
    val pKeys = part.filter(col("p_name").startsWith(Q20NamePrefix))
      .select(col("p_partkey"))
    val pairs = lineitem
      .filter(year(col("l_shipdate")) === Q20Year)
      .join(broadcast(pKeys), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("qty"))
    val totals = pairs.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("qty")).as("part_qty"), count(lit(1)).as("n_sup"))
    val qualified = pairs
      .join(broadcast(totals), col("l_partkey") === col("t_partkey"))
      .filter(col("qty") * lit(2) * col("n_sup") > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    regionSuppliers(supplier, nation, region, Q20Region)
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  val q20Sql: String =
    s"""WITH ps AS (
         SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part
             WHERE p_name LIKE '$Q20NamePrefix%')
           AND year(l_shipdate) = $Q20Year
         GROUP BY 1, 2),
       tot AS (
         SELECT l_partkey, SUM(qty) AS part_qty, COUNT(*) AS n_sup
         FROM ps GROUP BY 1)
       SELECT s_suppkey, s_name, s_acctbal
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = '$Q20Region'
         AND s_suppkey IN (
           SELECT ps.l_suppkey FROM ps
           JOIN tot ON ps.l_partkey = tot.l_partkey
           WHERE 2 * ps.qty * tot.n_sup > tot.part_qty)
       ORDER BY s_suppkey"""

  // ---- Q13: customer order-count distribution ------------------------------

  val Q13ExcludedPriority = "1-URGENT"

  /** TPC-H Q13's distinguishing shape: a LEFT OUTER join whose filter
    * lives IN THE JOIN CONDITION — customers keep their row (and count
    * 0) when every order is excluded, which a WHERE clause would
    * silently drop — then a histogram over the per-customer counts.
    * Two aggregates: per-customer (shuffle on the join key Spark
    * already grouped by) and the O(distinct-counts) distribution.
    */
  def q13OrderDistribution(customer: DataFrame, orders: DataFrame)
      : DataFrame = {
    val o = orders.filter(col("o_orderpriority") =!= Q13ExcludedPriority)
      .select(col("o_custkey"), col("o_orderkey"))
    customer.select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    s"""SELECT c_count, COUNT(*) AS custdist
       FROM (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer
         LEFT JOIN orders ON c_custkey = o_custkey
           AND o_orderpriority <> '$Q13ExcludedPriority'
         GROUP BY c_custkey)
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_order_distribution" -> ((s, d) =>
      q13OrderDistribution(Tables.customer(s, d), Tables.orders(s, d))),
    "q2_min_cost_supplier" -> ((s, d) =>
      q2MinCostSupplier(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q11_important_parts" -> ((s, d) =>
      q11ImportantParts(Tables.lineitem(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q16_supplier_counts" -> ((s, d) =>
      q16SupplierCounts(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d))),
    "q20_qualified_suppliers" -> ((s, d) =>
      q20QualifiedSuppliers(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))))

  def oracles: Map[String, String] = Map(
    "q13_order_distribution" -> q13Sql,
    "q2_min_cost_supplier" -> q2Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_counts" -> q16Sql,
    "q20_qualified_suppliers" -> q20Sql)
}
