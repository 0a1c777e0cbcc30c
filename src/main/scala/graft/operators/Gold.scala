package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Medallion.{davg, dsum}

/** Gold-layer KPI views: the reference's gold materialized views
  * (ref /root/reference/src/pipelines/gold/{daily_orders,monthly_orders,
  * category_performance,orders_by_state,seller_performance}.sql)
  * re-expressed over the testdata schema.
  *
  * Scale notes: each gold view is a single hash-aggregate over the
  * silver fact (partial aggregation combines map-side, so the shuffle
  * carries one row per group per task, not raw rows). The month-over-
  * month LAG windows run over the *aggregated* output (tiny), never the
  * fact. Constant-size dims (nation, region) are broadcast-hinted;
  * SF-scaling dims (part, supplier) are left to statistics + AQE.
  */
object Gold {

  // =========================================================================
  // gold_daily_orders — ref gold/daily_orders.sql (grain: day)
  // =========================================================================
  def dailyOrders(enriched: DataFrame): DataFrame = enriched
    .filter(col("order_date").isNotNull)
    .groupBy(col("order_date"))
    .agg(
      count(lit(1)).as("total_orders"),
      count(when(col("is_fulfilled"), 1)).as("fulfilled_orders"),
      count(when(col("is_open"), 1)).as("open_orders"),
      count(when(col("order_status") === "pending", 1)).as("pending_orders"),
      count(when(col("is_high_priority"), 1)).as("high_priority_orders"),
      dsum(col("items_total_value")).as("total_revenue"),
      dsum(col("items_price")).as("product_revenue"),
      dsum(col("items_freight")).as("freight_revenue"),
      davg(col("items_total_value")).as("avg_order_value"),
      sum(col("item_count")).as("total_items"),
      (sum(col("item_count")).cast("double") / count(lit(1)))
        .as("avg_items_per_order"),
      countDistinct(col("customer_id")).as("unique_customers"),
      (count(when(col("is_fulfilled"), 1)) * lit(100.0) / count(lit(1)))
        .as("fulfilled_rate"),
      (sum(col("days_to_last_ship")).cast("double") /
        count(col("days_to_last_ship"))).as("avg_days_to_last_ship"))

  val dailyOrdersSql: String =
    s"""WITH enr AS (${Medallion.silverOrdersEnrichedBodySql})
       SELECT order_date,
         COUNT(*) AS total_orders,
         COUNT(CASE WHEN is_fulfilled THEN 1 END) AS fulfilled_orders,
         COUNT(CASE WHEN is_open THEN 1 END) AS open_orders,
         COUNT(CASE WHEN order_status = 'pending' THEN 1 END) AS pending_orders,
         COUNT(CASE WHEN is_high_priority THEN 1 END) AS high_priority_orders,
         CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
         CAST(SUM(CAST(items_price AS DECIMAL(18,4))) AS DOUBLE) AS product_revenue,
         CAST(SUM(CAST(items_freight AS DECIMAL(18,4))) AS DOUBLE) AS freight_revenue,
         CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(CAST(items_total_value AS DECIMAL(18,4))) AS avg_order_value,
         CAST(SUM(item_count) AS BIGINT) AS total_items,
         CAST(SUM(item_count) AS DOUBLE) / COUNT(*) AS avg_items_per_order,
         COUNT(DISTINCT customer_id) AS unique_customers,
         COUNT(CASE WHEN is_fulfilled THEN 1 END) * 100.0 / COUNT(*) AS fulfilled_rate,
         CAST(SUM(days_to_last_ship) AS DOUBLE) / COUNT(days_to_last_ship)
           AS avg_days_to_last_ship
       FROM enr
       WHERE order_date IS NOT NULL
       GROUP BY order_date
       ORDER BY order_date"""

  // =========================================================================
  // gold_monthly_orders — ref gold/monthly_orders.sql (grain: month + LAG)
  // =========================================================================
  def monthlyOrders(enriched: DataFrame): DataFrame = {
    val m = enriched
      .filter(col("order_month").isNotNull)
      .groupBy(col("order_month"), col("order_year"))
      .agg(
        count(lit(1)).as("total_orders"),
        count(when(col("is_fulfilled"), 1)).as("fulfilled_orders"),
        count(when(col("order_status") === "pending", 1)).as("pending_orders"),
        dsum(col("items_total_value")).as("total_revenue"),
        dsum(col("items_price")).as("product_revenue"),
        dsum(col("items_freight")).as("freight_revenue"),
        davg(col("items_total_value")).as("avg_order_value"),
        countDistinct(col("customer_id")).as("unique_customers"),
        (count(when(col("is_fulfilled"), 1)) * lit(100.0) / count(lit(1)))
          .as("fulfilled_rate"))
      .withColumn("revenue_per_customer",
        col("total_revenue") / nullif(col("unique_customers"), lit(0L)))
    val w = Window.orderBy(col("order_month"))
    m.withColumn("prev_month_revenue", lag(col("total_revenue"), 1).over(w))
      .withColumn("prev_month_orders", lag(col("total_orders"), 1).over(w))
  }

  val monthlyOrdersSql: String =
    s"""WITH enr AS (${Medallion.silverOrdersEnrichedBodySql}),
       m AS (
         SELECT order_month, order_year,
           COUNT(*) AS total_orders,
           COUNT(CASE WHEN is_fulfilled THEN 1 END) AS fulfilled_orders,
           COUNT(CASE WHEN order_status = 'pending' THEN 1 END) AS pending_orders,
           CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CAST(items_price AS DECIMAL(18,4))) AS DOUBLE) AS product_revenue,
           CAST(SUM(CAST(items_freight AS DECIMAL(18,4))) AS DOUBLE) AS freight_revenue,
           CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(CAST(items_total_value AS DECIMAL(18,4))) AS avg_order_value,
           COUNT(DISTINCT customer_id) AS unique_customers,
           COUNT(CASE WHEN is_fulfilled THEN 1 END) * 100.0 / COUNT(*) AS fulfilled_rate
         FROM enr
         WHERE order_month IS NOT NULL
         GROUP BY order_month, order_year)
       SELECT order_month, order_year, total_orders, fulfilled_orders,
         pending_orders, total_revenue, product_revenue, freight_revenue,
         avg_order_value, unique_customers, fulfilled_rate,
         total_revenue / NULLIF(unique_customers, 0) AS revenue_per_customer,
         LAG(total_revenue, 1) OVER (ORDER BY order_month) AS prev_month_revenue,
         LAG(total_orders, 1) OVER (ORDER BY order_month) AS prev_month_orders
       FROM m
       ORDER BY order_month"""

  // =========================================================================
  // gold_category_performance — ref gold/category_performance.sql
  // =========================================================================
  def categoryPerformance(orders: DataFrame, lineitem: DataFrame,
      part: DataFrame): DataFrame = {
    val so = Medallion.silverOrders(orders)
      .select("order_id", "order_month")
    val sl = Medallion.silverLineitem(lineitem)
    val sp = Medallion.silverProducts(part)
      .select("product_id", "category", "size_category")
    val base = sl
      .join(so, Seq("order_id"))
      .join(sp, Seq("product_id"), "left") // part scales with SF — AQE decides
      .select(
        col("order_month"),
        coalesce(col("category"), lit("uncategorized")).as("product_category"),
        col("order_id"), col("product_id"), col("seller_id"),
        col("price"), col("freight_value"), col("total_item_value"),
        col("size_category"))
    val agg = base
      .groupBy(col("order_month"), col("product_category"))
      .agg(
        countDistinct(col("order_id")).as("total_orders"),
        count(lit(1)).as("total_items_sold"),
        countDistinct(col("product_id")).as("unique_products"),
        countDistinct(col("seller_id")).as("unique_sellers"),
        dsum(col("price")).as("gmv"),
        dsum(col("freight_value")).as("freight_revenue"),
        dsum(col("total_item_value")).as("total_revenue"),
        davg(col("price")).as("avg_item_price"),
        count(when(col("size_category") === "small", 1)).as("small_items"),
        count(when(col("size_category") === "medium", 1)).as("medium_items"),
        count(when(col("size_category") === "large", 1)).as("large_items"),
        count(when(col("size_category") === "extra_large", 1))
          .as("extra_large_items"))
    val w = Window.partitionBy(col("product_category")).orderBy(col("order_month"))
    agg.withColumn("prev_month_gmv", lag(col("gmv"), 1).over(w))
  }

  val categoryPerformanceSql: String =
    """WITH so AS (
         SELECT o_orderkey AS order_id, date_trunc('month', o_orderdate) AS order_month
         FROM orders
         WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
           AND o_orderstatus IN ('O','F','P') AND o_orderdate IS NOT NULL),
       sl AS (
         SELECT l_orderkey AS order_id, l_partkey AS product_id,
           l_suppkey AS seller_id, l_extendedprice AS price,
           l_extendedprice * l_tax AS freight_value,
           l_extendedprice + l_extendedprice * l_tax AS total_item_value
         FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_linenumber > 0
           AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
           AND l_quantity > 0 AND l_extendedprice >= 0
           AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0),
       sp AS (
         SELECT p_partkey AS product_id, lower(trim(p_type)) AS category,
           CASE WHEN p_size IS NULL THEN 'unknown'
                WHEN p_size < 10 THEN 'small'
                WHEN p_size < 25 THEN 'medium'
                WHEN p_size < 40 THEN 'large'
                ELSE 'extra_large' END AS size_category
         FROM part
         WHERE p_partkey IS NOT NULL AND (p_size IS NULL OR p_size >= 0)),
       agg AS (
         SELECT so.order_month,
           COALESCE(sp.category, 'uncategorized') AS product_category,
           COUNT(DISTINCT sl.order_id) AS total_orders,
           COUNT(*) AS total_items_sold,
           COUNT(DISTINCT sl.product_id) AS unique_products,
           COUNT(DISTINCT sl.seller_id) AS unique_sellers,
           CAST(SUM(CAST(sl.price AS DECIMAL(18,4))) AS DOUBLE) AS gmv,
           CAST(SUM(CAST(sl.freight_value AS DECIMAL(18,4))) AS DOUBLE) AS freight_revenue,
           CAST(SUM(CAST(sl.total_item_value AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CAST(sl.price AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(CAST(sl.price AS DECIMAL(18,4))) AS avg_item_price,
           COUNT(CASE WHEN sp.size_category = 'small' THEN 1 END) AS small_items,
           COUNT(CASE WHEN sp.size_category = 'medium' THEN 1 END) AS medium_items,
           COUNT(CASE WHEN sp.size_category = 'large' THEN 1 END) AS large_items,
           COUNT(CASE WHEN sp.size_category = 'extra_large' THEN 1 END) AS extra_large_items
         FROM sl
         JOIN so ON sl.order_id = so.order_id
         LEFT JOIN sp ON sl.product_id = sp.product_id
         GROUP BY so.order_month, COALESCE(sp.category, 'uncategorized'))
       SELECT *,
         LAG(gmv, 1) OVER (PARTITION BY product_category ORDER BY order_month)
           AS prev_month_gmv
       FROM agg
       ORDER BY order_month, product_category"""

  // =========================================================================
  // gold_orders_by_state — ref gold/orders_by_state.sql (geo rollup + CTE)
  // =========================================================================
  def ordersByState(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val so = Medallion.silverOrders(orders)
    val orderTotals = Medallion.silverLineitem(lineitem)
      .groupBy(col("order_id"))
      .agg(dsum(col("total_item_value")).as("order_total"))
    val cust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("customer_id"),
        trim(col("n_name")).as("nation_name"),
        trim(col("r_name")).as("region_name"))
    so.join(cust, Seq("customer_id"))
      .join(orderTotals, Seq("order_id"), "left")
      .groupBy(col("order_date"), col("nation_name"), col("region_name"))
      .agg(
        count(lit(1)).as("total_orders"),
        count(when(col("order_status") === "fulfilled", 1))
          .as("fulfilled_orders"),
        dsum(coalesce(col("order_total"), lit(0.0))).as("total_revenue"),
        davg(coalesce(col("order_total"), lit(0.0))).as("avg_order_value"),
        countDistinct(col("customer_id")).as("unique_customers"))
  }

  val ordersByStateSql: String =
    """WITH so AS (
         SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           CASE WHEN o_orderstatus = 'O' THEN 'open'
                WHEN o_orderstatus = 'F' THEN 'fulfilled'
                ELSE 'pending' END AS order_status,
           CAST(o_orderdate AS DATE) AS order_date
         FROM orders
         WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
           AND o_orderstatus IN ('O','F','P') AND o_orderdate IS NOT NULL),
       ot AS (
         SELECT l_orderkey AS order_id,
           CAST(SUM(CAST(l_extendedprice + l_extendedprice * l_tax
             AS DECIMAL(18,4))) AS DOUBLE) AS order_total
         FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_linenumber > 0
           AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
           AND l_quantity > 0 AND l_extendedprice >= 0
           AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0
         GROUP BY l_orderkey),
       cust AS (
         SELECT c_custkey AS customer_id, trim(n_name) AS nation_name,
           trim(r_name) AS region_name
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey)
       SELECT so.order_date, cust.nation_name, cust.region_name,
         COUNT(*) AS total_orders,
         COUNT(CASE WHEN so.order_status = 'fulfilled' THEN 1 END)
           AS fulfilled_orders,
         CAST(SUM(CAST(COALESCE(ot.order_total, 0.0) AS DECIMAL(18,4)))
           AS DOUBLE) AS total_revenue,
         CAST(SUM(CAST(COALESCE(ot.order_total, 0.0) AS DECIMAL(18,4)))
           AS DOUBLE) / COUNT(CAST(COALESCE(ot.order_total, 0.0)
           AS DECIMAL(18,4))) AS avg_order_value,
         COUNT(DISTINCT so.customer_id) AS unique_customers
       FROM so
       JOIN cust ON so.customer_id = cust.customer_id
       LEFT JOIN ot ON so.order_id = ot.order_id
       GROUP BY so.order_date, cust.nation_name, cust.region_name
       ORDER BY so.order_date, cust.nation_name"""

  // =========================================================================
  // gold_seller_performance — ref gold/seller_performance.sql
  // =========================================================================
  def sellerPerformance(orders: DataFrame, lineitem: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val so = Medallion.silverOrders(orders)
      .select("order_id", "customer_id", "order_date")
    val sl = Medallion.silverLineitem(lineitem)
    val sellers = Medallion.silverSellers(supplier, nation, region)
      .select("seller_id", "seller_name", "nation_name", "seller_region")
    sl.join(so, Seq("order_id"))
      .join(sellers, Seq("seller_id")) // supplier scales with SF — AQE decides
      .groupBy(col("order_date"), col("seller_id"), col("seller_name"),
        col("nation_name"), col("seller_region"))
      .agg(
        countDistinct(col("order_id")).as("total_orders"),
        count(lit(1)).as("total_items_sold"),
        countDistinct(col("product_id")).as("unique_products_sold"),
        dsum(col("price")).as("gmv"),
        dsum(col("freight_value")).as("freight_collected"),
        dsum(col("total_item_value")).as("total_revenue"),
        davg(col("price")).as("avg_item_price"),
        countDistinct(col("customer_id")).as("unique_customers"))
  }

  val sellerPerformanceSql: String =
    """WITH so AS (
         SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           CAST(o_orderdate AS DATE) AS order_date
         FROM orders
         WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
           AND o_orderstatus IN ('O','F','P') AND o_orderdate IS NOT NULL),
       sl AS (
         SELECT l_orderkey AS order_id, l_partkey AS product_id,
           l_suppkey AS seller_id, l_extendedprice AS price,
           l_extendedprice * l_tax AS freight_value,
           l_extendedprice + l_extendedprice * l_tax AS total_item_value
         FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_linenumber > 0
           AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
           AND l_quantity > 0 AND l_extendedprice >= 0
           AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0),
       sellers AS (
         SELECT s_suppkey AS seller_id, trim(s_name) AS seller_name,
           trim(n_name) AS nation_name, trim(r_name) AS seller_region
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL)
       SELECT so.order_date, sl.seller_id, sellers.seller_name,
         sellers.nation_name, sellers.seller_region,
         COUNT(DISTINCT sl.order_id) AS total_orders,
         COUNT(*) AS total_items_sold,
         COUNT(DISTINCT sl.product_id) AS unique_products_sold,
         CAST(SUM(CAST(sl.price AS DECIMAL(18,4))) AS DOUBLE) AS gmv,
         CAST(SUM(CAST(sl.freight_value AS DECIMAL(18,4))) AS DOUBLE)
           AS freight_collected,
         CAST(SUM(CAST(sl.total_item_value AS DECIMAL(18,4))) AS DOUBLE)
           AS total_revenue,
         CAST(SUM(CAST(sl.price AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(CAST(sl.price AS DECIMAL(18,4))) AS avg_item_price,
         COUNT(DISTINCT so.customer_id) AS unique_customers
       FROM sl
       JOIN so ON sl.order_id = so.order_id
       JOIN sellers ON sl.seller_id = sellers.seller_id
       GROUP BY so.order_date, sl.seller_id, sellers.seller_name,
         sellers.nation_name, sellers.seller_region
       ORDER BY so.order_date, sl.seller_id"""

  // =========================================================================
  // gold_revenue_7d_ma — trailing moving average over the daily rollup
  // (the MoM-comparison pattern of gold/monthly_orders.sql:50-52 at a
  // finer grain)
  // =========================================================================
  /** 7-row trailing window over the daily aggregate. The frame sum runs
    * over DECIMAL so the sliding reduction is exact (bit-identical at
    * any frame evaluation order); the window input is the already-tiny
    * daily rollup, never the fact.
    */
  def revenue7dMa(enriched: DataFrame): DataFrame = {
    val daily = dailyOrders(enriched)
      .select(col("order_date"), col("total_orders"), col("total_revenue"))
    val w = Window.orderBy(col("order_date")).rowsBetween(-6, 0)
    daily
      .withColumn("revenue_7d_ma",
        sum(col("total_revenue").cast("decimal(18,4)")).over(w).cast("double")
          / count(lit(1)).over(w))
      .withColumn("orders_7d_ma",
        sum(col("total_orders")).over(w).cast("double")
          / count(lit(1)).over(w))
  }

  val revenue7dMaSql: String =
    s"""WITH enr AS (${Medallion.silverOrdersEnrichedBodySql}),
       daily AS (
         SELECT order_date,
           COUNT(*) AS total_orders,
           CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
         FROM enr
         WHERE order_date IS NOT NULL
         GROUP BY order_date)
       SELECT order_date, total_orders, total_revenue,
         CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS revenue_7d_ma,
         CAST(SUM(total_orders) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS orders_7d_ma
       FROM daily
       WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       ORDER BY order_date"""

  // =========================================================================
  // gold_customer_ltv — customer lifetime metrics (the customer-grain
  // analytics the reference's gold layer implies via unique_customers /
  // revenue_per_customer, materialized per customer)
  // =========================================================================
  def customerLtv(enriched: DataFrame): DataFrame = enriched
    .groupBy(col("customer_id"))
    .agg(
      count(lit(1)).as("lifetime_orders"),
      dsum(col("items_total_value")).as("lifetime_value"),
      davg(col("items_total_value")).as("avg_order_value"),
      min(col("order_date")).as("first_order_date"),
      max(col("order_date")).as("last_order_date"),
      datediff(max(col("order_date")), min(col("order_date"))).cast("long")
        .as("tenure_days"),
      count(when(col("is_fulfilled"), 1)).as("fulfilled_orders"),
      max(col("is_high_priority")).as("ever_high_priority"))

  val customerLtvSql: String =
    s"""WITH enr AS (${Medallion.silverOrdersEnrichedBodySql})
       SELECT customer_id,
         COUNT(*) AS lifetime_orders,
         CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE) AS lifetime_value,
         CAST(SUM(CAST(items_total_value AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(CAST(items_total_value AS DECIMAL(18,4))) AS avg_order_value,
         MIN(order_date) AS first_order_date,
         MAX(order_date) AS last_order_date,
         datediff('day', MIN(order_date), MAX(order_date)) AS tenure_days,
         COUNT(CASE WHEN is_fulfilled THEN 1 END) AS fulfilled_orders,
         MAX(is_high_priority) AS ever_high_priority
       FROM enr
       GROUP BY customer_id
       ORDER BY customer_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gold_customer_ltv" -> ((s, d) =>
      customerLtv(Medallion.silverOrdersEnrichedItems(
        Tables.orders(s, d), Tables.lineitem(s, d)))
        .orderBy(col("customer_id"))),
    "gold_revenue_7d_ma" -> ((s, d) =>
      revenue7dMa(Medallion.silverOrdersEnrichedItems(
        Tables.orders(s, d), Tables.lineitem(s, d)))
        .orderBy(col("order_date"))),
    "gold_daily_orders" -> ((s, d) =>
      dailyOrders(Medallion.silverOrdersEnrichedItems(
        Tables.orders(s, d), Tables.lineitem(s, d)))
        .orderBy(col("order_date"))),
    "gold_monthly_orders" -> ((s, d) =>
      monthlyOrders(Medallion.silverOrdersEnrichedItems(
        Tables.orders(s, d), Tables.lineitem(s, d)))
        .orderBy(col("order_month"))),
    "gold_category_performance" -> ((s, d) =>
      categoryPerformance(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.part(s, d))
        .orderBy(col("order_month"), col("product_category"))),
    "gold_orders_by_state" -> ((s, d) =>
      ordersByState(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        .orderBy(col("order_date"), col("nation_name"))),
    "gold_seller_performance" -> ((s, d) =>
      sellerPerformance(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))
        .orderBy(col("order_date"), col("seller_id"))))

  def oracles: Map[String, String] = Map(
    "gold_customer_ltv" -> customerLtvSql,
    "gold_revenue_7d_ma" -> revenue7dMaSql,
    "gold_daily_orders" -> dailyOrdersSql,
    "gold_monthly_orders" -> monthlyOrdersSql,
    "gold_category_performance" -> categoryPerformanceSql,
    "gold_orders_by_state" -> ordersByStateSql,
    "gold_seller_performance" -> sellerPerformanceSql)
}
