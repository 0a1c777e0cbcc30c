package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Medallion.{davg, dsum}

/** Classic decision-support join/agg shapes (TPC-H Q4/Q14/Q17/Q18/Q19/Q22)
  * re-expressed over the driver testdata. These widen relational coverage
  * beyond the Q1/Q3/Q5 headliners: EXISTS via left_semi with a join-time
  * range predicate (Q4), conditional aggregation shares (Q14), a
  * correlated per-group threshold rewritten as one window pass (Q17),
  * HAVING-filtered fact rollup feeding a second join (Q18), disjunctive
  * multi-column join predicates (Q19), and scalar-subquery + anti-join
  * (Q22). Every shape keeps the 100 TB posture: facts shuffle once on
  * their join key, dims broadcast, predicates sit on the scan.
  */
object TpchShapes {

  /** Q4 shape: orders in a quarter having at least one line shipped
    * after the order date. left_semi keeps only order columns flowing
    * (no fan-out, no dedup needed) and the date window is pushed to the
    * orders scan; lineitem is pre-projected to the two columns the
    * semi-join condition needs.
    */
  def q4OrderPriority(orders: DataFrame, li: DataFrame): DataFrame = {
    val window = orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    window
      .join(li.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority").as("order_priority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority AS order_priority, COUNT(*) AS order_count
       FROM orders o
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-04-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate)
       GROUP BY 1 ORDER BY 1"""

  /** Q14 shape: promo revenue share per ship month. One broadcast join
    * (part is a dim) + conditional decimal aggregation; the share is a
    * single IEEE division of two exact decimal sums (§3.7-safe).
    */
  def q14PromoShare(li: DataFrame, part: DataFrame): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(24, 6))
    li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(24, 6))))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))
  }

  val q14Sql: String =
    """SELECT date_trunc('month', l_shipdate) AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY 1 ORDER BY 1"""

  /** Q17 shape: revenue from small-quantity lines of selected brands,
    * where "small" means below 20% of the part's average quantity. The
    * correlated per-part average is ONE window pass over the already
    * brand-filtered join (partition by part key), and the fractional
    * threshold is cross-multiplied into exact-decimal integer form:
    * qty < sum/(5·cnt)  ⟺  5·qty·cnt < sum — no division, no float.
    */
  def q17SmallQuantity(li: DataFrame, part: DataFrame): DataFrame = {
    val brands = Seq("Brand#11", "Brand#22", "Brand#25")
    val w = Window.partitionBy(col("l_partkey"))
    val dqty = col("l_quantity").cast(DecimalType(18, 4))
    li.join(broadcast(part.filter(col("p_brand").isin(brands: _*))
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("part_qty_sum", sum(dqty).over(w))
      .withColumn("part_qty_cnt", count(dqty).over(w))
      .filter(dqty * lit(5) * col("part_qty_cnt") < col("part_qty_sum"))
      .groupBy(col("p_brand").as("brand"))
      .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("line_count"))
  }

  val q17Sql: String =
    """SELECT p_brand AS brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS line_count
       FROM (SELECT p_brand, l_extendedprice,
               CAST(l_quantity AS DECIMAL(18,4)) AS dqty,
               SUM(CAST(l_quantity AS DECIMAL(18,4)))
                 OVER (PARTITION BY l_partkey) AS part_qty_sum,
               COUNT(CAST(l_quantity AS DECIMAL(18,4)))
                 OVER (PARTITION BY l_partkey) AS part_qty_cnt
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_brand IN ('Brand#11','Brand#22','Brand#25'))
       WHERE dqty * 5 * part_qty_cnt < part_qty_sum
       GROUP BY 1 ORDER BY 1"""

  /** Q18 shape: large-volume orders. The per-order quantity rollup is
    * map-side combinable and ALREADY shrinks lineitem to order grain
    * before any join; only qualifying orders (rare — ~1%) reach the
    * customer join, so at 100 TB the second join's probe side is tiny.
    */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame,
      li: DataFrame): DataFrame = {
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name").as("customer_name"),
        col("c_custkey").as("customer_id"),
        col("o_orderkey").as("order_id"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice").as("total_price"),
        col("sum_qty"))
  }

  val q18Sql: String =
    """SELECT c_name AS customer_name, c_custkey AS customer_id,
       o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice AS total_price, sum_qty
       FROM (SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             FROM lineitem GROUP BY 1
             HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 250.0)
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY order_id"""

  /** Q19 shape: disjunctive multi-column join predicates — three
    * brand/size/quantity conjunctions OR'd together. The part-side
    * conjuncts prune the broadcast build; the common necessary
    * condition on l_quantity (1..30 across all branches) is factored
    * out so the fact scan still gets a pushable predicate.
    */
  def q19Disjunctive(li: DataFrame, part: DataFrame): DataFrame = {
    val p = broadcast(part.filter(
      col("p_brand").isin("Brand#12", "Brand#23", "Brand#24") &&
        col("p_size").between(1, 35))
      .select("p_partkey", "p_brand", "p_size"))
    val branch =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    li.filter(col("l_quantity").between(1, 30)) // factored necessary condition — pushed to the scan
      .join(p, col("l_partkey") === col("p_partkey") && branch)
      .groupBy(col("p_brand").as("brand"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("line_count"))
  }

  val q19Sql: String =
    """SELECT p_brand AS brand,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
              AND l_quantity BETWEEN 20 AND 30)
       GROUP BY 1 ORDER BY 1"""

  /** Q22 shape: wealthy-but-churned customers per segment. The global
    * positive-balance average arrives as ONE aggregated row joined in
    * (the scalar-subquery analog — broadcast, not collect), the
    * comparison is cross-multiplied to exact decimals, and "inactive"
    * is a left_anti against orders placed since the cutoff — the date
    * predicate sits on the orders scan, so the anti build side shrinks
    * before it ever shuffles. (Classic Q22 anti-joins ALL orders; the
    * driver data gives every customer lifetime orders, so the faithful
    * analog is recency churn, not lifetime absence.)
    */
  val ChurnCutoff = "2000-07-01"

  def q22WealthyInactive(customer: DataFrame, orders: DataFrame): DataFrame = {
    val dbal = col("c_acctbal").cast(DecimalType(18, 4))
    val thresh = customer.filter(col("c_acctbal") > 0.0)
      .agg(sum(dbal).as("pos_sum"), count(dbal).as("pos_cnt"))
    val recent = orders
      .filter(col("o_orderdate") >= lit(ChurnCutoff).cast("timestamp"))
      .select("o_custkey")
    customer
      .join(broadcast(thresh)) // single-row scalar — BNLJ degenerates to a map-side append
      .filter(dbal * col("pos_cnt") > col("pos_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("num_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))
  }

  val q22Sql: String =
    s"""SELECT c_mktsegment AS segment, COUNT(*) AS num_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
       FROM customer c
       WHERE CAST(c_acctbal AS DECIMAL(18,4))
               * (SELECT COUNT(CAST(c_acctbal AS DECIMAL(18,4)))
                  FROM customer WHERE c_acctbal > 0.0)
             > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                FROM customer WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '$ChurnCutoff')
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_order_priority" -> ((s, d) =>
      q4OrderPriority(Tables.orders(s, d), Tables.lineitem(s, d))
        .orderBy(col("order_priority"))),
    "q14_promo_share" -> ((s, d) =>
      q14PromoShare(Tables.lineitem(s, d), Tables.part(s, d))
        .orderBy(col("ship_month"))),
    "q17_small_quantity" -> ((s, d) =>
      q17SmallQuantity(Tables.lineitem(s, d), Tables.part(s, d))
        .orderBy(col("brand"))),
    "q18_large_orders" -> ((s, d) =>
      q18LargeOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d)).orderBy(col("order_id"))),
    "q19_disjunctive" -> ((s, d) =>
      q19Disjunctive(Tables.lineitem(s, d), Tables.part(s, d))
        .orderBy(col("brand"))),
    "q22_wealthy_inactive" -> ((s, d) =>
      q22WealthyInactive(Tables.customer(s, d), Tables.orders(s, d))
        .orderBy(col("segment"))))

  def oracles: Map[String, String] = Map(
    "q4_order_priority" -> q4Sql,
    "q14_promo_share" -> q14Sql,
    "q17_small_quantity" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q22_wealthy_inactive" -> q22Sql)
}
