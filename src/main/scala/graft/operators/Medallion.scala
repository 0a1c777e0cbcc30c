package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Silver-layer operators: the cleanse / validate / derive semantics of
  * the reference's silver pipelines, re-expressed over the testdata
  * star schema.
  *
  * Reference semantics covered (file:line refers to /root/reference):
  *  - declarative DQ constraints with DROP-row behavior
  *    (src/pipelines/silver/order_items.sql:12-27 etc.) → [[Quality]]
  *    rules applied as one fused filter (single scan, fully pushed
  *    down to parquet).
  *  - trim/cast normalization + derived business columns
  *    (src/pipelines/silver/orders.sql:30-60).
  *  - dedup-with-averaging reference view
  *    (src/pipelines/silver/geolocation.sql:14-36).
  *  - denormalized enriched view: fact LEFT JOIN per-key aggregates
  *    (src/pipelines/silver/orders_enriched.sql:15-110).
  *
  * Scale notes: every builder projects + filters before any shuffle;
  * dimension joins (nation, region, part, supplier) are broadcast;
  * per-order aggregates use hash partial aggregation (map-side
  * combine) so the single shuffle carries pre-reduced rows.
  */
object Medallion {

  /** Exact, order-independent money sum: aggregate as decimal then cast
    * to double. Reduction over doubles is partition-order dependent and
    * would diverge from any single-threaded oracle; decimal sums are
    * exact at any parallelism. Matches oracle shape
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-independent mean built from the exact decimal sum. */
  def davg(c: Column): Column = dsum(c) / count(c.cast(DecimalType(18, 4)))

  // =========================================================================
  // bronze_ingest — ref src/pipelines/bronze/orders.sql (audit-column
  // pattern; the CSV/Auto-Loader reader itself lives in sources.CsvIngest)
  // =========================================================================
  /** Raw ingest with the reference's audit-column pattern. The
    * reference stamps `_source_file` / `_ingested_at`
    * (bronze/orders.sql:14-17); here the deterministic equivalents are
    * the source table tag and a content key (wall-clock audit stamps
    * are excluded from compared output by design).
    */
  def bronzeIngest(o: DataFrame, sourceTable: String): DataFrame = o
    .withColumn("_source_table", lit(sourceTable))
    .withColumn("_row_key", md5(col("o_orderkey").cast("string")))

  val bronzeIngestSql: String =
    """SELECT *, 'orders' AS _source_table,
       md5(CAST(o_orderkey AS VARCHAR)) AS _row_key
       FROM orders
       ORDER BY o_orderkey"""

  // =========================================================================
  // silver_lineitem — ref src/pipelines/silver/order_items.sql
  // =========================================================================
  def silverLineitem(li: DataFrame): DataFrame = li
    .filter(
      col("l_orderkey").isNotNull && col("l_linenumber") > 0 &&
      col("l_partkey").isNotNull && col("l_suppkey").isNotNull &&
      col("l_quantity") > 0 && col("l_extendedprice") >= 0 &&
      col("l_discount").between(0, 1) && col("l_tax") >= 0)
    .select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").cast("int").as("line_number"),
      col("l_partkey").as("product_id"),
      col("l_suppkey").as("seller_id"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("price"),
      col("l_discount").as("discount"),
      col("l_tax").as("tax"),
      col("l_returnflag").as("return_flag"),
      col("l_linestatus").as("line_status"),
      to_date(col("l_shipdate")).as("ship_date"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("discounted_price"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("charge"),
      (col("l_extendedprice") * col("l_tax")).as("freight_value"),
      (col("l_extendedprice") + col("l_extendedprice") * col("l_tax"))
        .as("total_item_value"))

  val silverLineitemSql: String =
    """SELECT l_orderkey AS order_id,
       CAST(l_linenumber AS INT) AS line_number,
       l_partkey AS product_id,
       l_suppkey AS seller_id,
       l_quantity AS quantity,
       l_extendedprice AS price,
       l_discount AS discount,
       l_tax AS tax,
       l_returnflag AS return_flag,
       l_linestatus AS line_status,
       CAST(l_shipdate AS DATE) AS ship_date,
       l_extendedprice * (1.0 - l_discount) AS discounted_price,
       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
       l_extendedprice * l_tax AS freight_value,
       l_extendedprice + l_extendedprice * l_tax AS total_item_value
       FROM lineitem
       WHERE l_orderkey IS NOT NULL AND l_linenumber > 0
         AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
         AND l_quantity > 0 AND l_extendedprice >= 0
         AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0
       ORDER BY order_id, line_number"""

  // =========================================================================
  // silver_orders — ref src/pipelines/silver/orders.sql
  // =========================================================================
  def silverOrders(o: DataFrame): DataFrame = o
    .filter(
      col("o_orderkey").isNotNull && col("o_custkey").isNotNull &&
      col("o_orderstatus").isin("O", "F", "P") && col("o_orderdate").isNotNull)
    .select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      when(col("o_orderstatus") === "O", "open")
        .when(col("o_orderstatus") === "F", "fulfilled")
        .otherwise("pending").as("order_status"),
      col("o_totalprice").as("total_price"),
      to_date(col("o_orderdate")).as("order_date"),
      date_trunc("month", col("o_orderdate")).as("order_month"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_code"),
      lower(trim(substring(col("o_orderpriority"), 3, 20)))
        .as("priority_label"),
      (substring(col("o_orderpriority"), 1, 1).cast("int") <= 2)
        .as("is_high_priority"),
      // time dim (ref orders_enriched.sql:96-99); Spark dayofweek is
      // 1=Sunday, DuckDB's is 0=Sunday — oracle adds 1
      dayofweek(col("o_orderdate")).cast("int").as("order_dow"))

  val silverOrdersSql: String =
    """SELECT o_orderkey AS order_id,
       o_custkey AS customer_id,
       CASE WHEN o_orderstatus = 'O' THEN 'open'
            WHEN o_orderstatus = 'F' THEN 'fulfilled'
            ELSE 'pending' END AS order_status,
       o_totalprice AS total_price,
       CAST(o_orderdate AS DATE) AS order_date,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_code,
       lower(trim(substring(o_orderpriority, 3, 20))) AS priority_label,
       CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2 AS is_high_priority,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow
       FROM orders
       WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
         AND o_orderstatus IN ('O','F','P') AND o_orderdate IS NOT NULL
       ORDER BY order_id"""

  // =========================================================================
  // silver_customers — ref src/pipelines/silver/customers.sql (+ PII cols)
  // =========================================================================
  def silverCustomers(c: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = c
    .filter(
      col("c_custkey").isNotNull && col("c_name").isNotNull &&
      length(trim(col("c_name"))) > 0 && col("c_nationkey").isNotNull)
    .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    .select(
      col("c_custkey").as("customer_id"),
      trim(col("c_name")).as("customer_name"),
      lower(trim(col("c_mktsegment"))).as("mktsegment"),
      col("c_acctbal").as("acctbal"),
      when(col("c_acctbal") < 0, "delinquent")
        .when(col("c_acctbal") < 5000, "standard")
        .otherwise("premium").as("acct_status"),
      trim(col("n_name")).as("nation_name"),
      trim(col("r_name")).as("region_name"),
      // deterministic synthesized PII (masking demo targets)
      concat(lit("c"), col("c_custkey").cast("string"), lit("@example.com"))
        .as("customer_email"),
      concat(lit("+55 (11) 9"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit("-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
        .as("customer_phone"))

  val silverCustomersSql: String =
    """SELECT c_custkey AS customer_id,
       trim(c_name) AS customer_name,
       lower(trim(c_mktsegment)) AS mktsegment,
       c_acctbal AS acctbal,
       CASE WHEN c_acctbal < 0 THEN 'delinquent'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS acct_status,
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
         AND length(trim(c_name)) > 0 AND c_nationkey IS NOT NULL
       ORDER BY customer_id"""

  // =========================================================================
  // silver_products — ref src/pipelines/silver/products.sql
  // =========================================================================
  def silverProducts(p: DataFrame): DataFrame = p
    .filter(col("p_partkey").isNotNull && (col("p_size").isNull || col("p_size") >= 0))
    .select(
      col("p_partkey").as("product_id"),
      lower(trim(col("p_name"))).as("product_name"),
      lower(trim(col("p_type"))).as("category"),
      trim(col("p_brand")).as("brand"),
      col("p_size").cast("int").as("size"),
      col("p_retailprice").as("retail_price"),
      when(col("p_size").isNull, "unknown")
        .when(col("p_size") < 10, "small")
        .when(col("p_size") < 25, "medium")
        .when(col("p_size") < 40, "large")
        .otherwise("extra_large").as("size_category"),
      when(col("p_size") > 0, col("p_retailprice") / col("p_size").cast("double"))
        .as("price_per_size"))

  val silverProductsSql: String =
    """SELECT p_partkey AS product_id,
       lower(trim(p_name)) AS product_name,
       lower(trim(p_type)) AS category,
       trim(p_brand) AS brand,
       CAST(p_size AS INT) AS size,
       p_retailprice AS retail_price,
       CASE WHEN p_size IS NULL THEN 'unknown'
            WHEN p_size < 10 THEN 'small'
            WHEN p_size < 25 THEN 'medium'
            WHEN p_size < 40 THEN 'large'
            ELSE 'extra_large' END AS size_category,
       CASE WHEN p_size > 0 THEN p_retailprice / CAST(p_size AS DOUBLE) END
         AS price_per_size
       FROM part
       WHERE p_partkey IS NOT NULL AND (p_size IS NULL OR p_size >= 0)
       ORDER BY product_id"""

  // =========================================================================
  // silver_sellers — ref src/pipelines/silver/sellers.sql
  // =========================================================================
  def silverSellers(s: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = s
    .filter(col("s_suppkey").isNotNull && col("s_nationkey").isNotNull)
    .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
    .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    .select(
      col("s_suppkey").as("seller_id"),
      trim(col("s_name")).as("seller_name"),
      col("s_acctbal").as("acctbal"),
      when(col("s_acctbal") < 0, "delinquent")
        .when(col("s_acctbal") < 5000, "standard")
        .otherwise("premium").as("acct_status"),
      trim(col("n_name")).as("nation_name"),
      trim(col("r_name")).as("seller_region"))

  val silverSellersSql: String =
    """SELECT s_suppkey AS seller_id,
       trim(s_name) AS seller_name,
       s_acctbal AS acctbal,
       CASE WHEN s_acctbal < 0 THEN 'delinquent'
            WHEN s_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS acct_status,
       trim(n_name) AS nation_name,
       trim(r_name) AS seller_region
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL
       ORDER BY seller_id"""

  // =========================================================================
  // silver_geolocation — dedup-with-averaging, ref silver/geolocation.sql
  // =========================================================================
  def silverGeolocation(c: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = c
    .filter(col("c_nationkey").isNotNull && col("c_acctbal").isNotNull)
    .groupBy(col("c_nationkey"), lower(trim(col("c_mktsegment"))).as("mktsegment"))
    .agg(
      davg(col("c_acctbal")).as("avg_acctbal"),
      count(lit(1)).as("sample_count"))
    .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    .select(
      col("c_nationkey").cast("int").as("nation_id"),
      col("mktsegment"),
      trim(col("n_name")).as("nation_name"),
      trim(col("r_name")).as("region_name"),
      col("avg_acctbal"),
      col("sample_count"))

  val silverGeolocationSql: String =
    """SELECT CAST(c_nationkey AS INT) AS nation_id,
       lower(trim(c_mktsegment)) AS mktsegment,
       trim(n_name) AS nation_name,
       trim(r_name) AS region_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(c_acctbal) AS avg_acctbal,
       COUNT(*) AS sample_count
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
       GROUP BY 1, 2, 3, 4
       ORDER BY nation_id, mktsegment"""

  // =========================================================================
  // silver_orders_enriched — ref src/pipelines/silver/orders_enriched.sql
  // =========================================================================
  /** Items-only projection of the enriched view, consumed by the gold
    * builders. The reference materializes silver_orders_enriched once
    * and gold reads the stored view; this engine inlines the view into
    * each gold plan, so gold deliberately composes only the item
    * aggregate it actually reads — Catalyst cannot prove a LEFT JOIN
    * against the payments/reviews aggregates row-preserving, so keeping
    * them out of the gold plans is the inline equivalent of column
    * pruning on the materialized view.
    */
  def silverOrdersEnrichedItems(orders: DataFrame, lineitem: DataFrame): DataFrame =
    silverOrdersEnrichedItemsFromSilver(silverOrders(orders),
      silverLineitem(lineitem))

  /** [[silverOrdersEnrichedItems]] over ALREADY-cleansed inputs — the
    * pipeline DAG path, where silver_orders/silver_lineitem are landed
    * tables and re-running the cleanse would duplicate work.
    */
  def silverOrdersEnrichedItemsFromSilver(so: DataFrame, sl: DataFrame): DataFrame = {
    // per-order aggregate: partial-agg friendly single shuffle on order_id
    val mainAgg = sl.groupBy(col("order_id")).agg(
      count(lit(1)).as("item_count"),
      dsum(col("price")).as("items_price"),
      dsum(col("freight_value")).as("items_freight"),
      dsum(col("total_item_value")).as("items_total_value"),
      davg(col("price")).as("avg_item_price"),
      max(col("ship_date")).as("last_ship_date"),
      min(col("ship_date")).as("first_ship_date"),
      array_join(sort_array(collect_set(col("return_flag"))), ",")
        .as("return_flags"))
    // distinct counts as their own two-level aggregations: mixing
    // countDistinct with the aggregates above plans an Expand (×3 input
    // blowup through the shuffle, partial aggregation crippled by the
    // null-gated branches); distinct-then-count is fully map-side
    // combined on both levels and joins back on the aggregation key
    // (landing write at sf0.1 local[32]: 8.4s → 4.4s). NULL keys are
    // filtered to match countDistinct, with the join+coalesce restoring 0.
    def distinctCount(keyCol: String, as: String) =
      sl.filter(col(keyCol).isNotNull)
        .select(col("order_id"), col(keyCol)).distinct()
        .groupBy(col("order_id")).agg(count(lit(1)).as(as))
    val itemAgg = mainAgg
      .join(distinctCount("product_id", "unique_products"),
        Seq("order_id"), "left")
      .join(distinctCount("seller_id", "unique_sellers"),
        Seq("order_id"), "left")
    so.join(itemAgg, Seq("order_id"), "left")
      .select(
        col("order_id"), col("customer_id"), col("order_status"),
        col("total_price"), col("order_date"), col("order_month"),
        col("order_year"), col("priority_code"), col("priority_label"),
        col("is_high_priority"),
        coalesce(col("item_count"), lit(0L)).as("item_count"),
        coalesce(col("unique_products"), lit(0L)).as("unique_products"),
        coalesce(col("unique_sellers"), lit(0L)).as("unique_sellers"),
        coalesce(col("items_price"), lit(0.0)).as("items_price"),
        coalesce(col("items_freight"), lit(0.0)).as("items_freight"),
        coalesce(col("items_total_value"), lit(0.0)).as("items_total_value"),
        col("avg_item_price"),
        col("last_ship_date"), col("first_ship_date"),
        col("return_flags"),
        (col("order_status") === "fulfilled").as("is_fulfilled"),
        (col("order_status") === "open").as("is_open"),
        datediff(col("last_ship_date"), col("order_date")).cast("long")
          .as("days_to_last_ship"))
  }

  /** Full denormalized enriched view: orders LEFT JOIN **three**
    * per-order aggregates — items, payments, reviews — mirroring
    * /root/reference/src/pipelines/silver/orders_enriched.sql:15-46
    * (order_items_agg / order_payments_agg / order_reviews_agg) plus
    * the quarter/hour time dims (orders_enriched.sql:98-101). The
    * payments/reviews silver analogs are keyed by the events feed's
    * user_id, which stands in for order_id (see [[silverPayments]]);
    * max(payment_sequential) stands in for max(payment_installments).
    * order_hour is a faithful constant 0 — the source order timestamps
    * are date-grain, and HOUR() of a midnight timestamp is 0.
    *
    * Scale: independent partial-agg-friendly shuffles (one per
    * aggregate, each on its own key; the items aggregate splits its
    * distinct counts into their own two-level aggregations rather than
    * Expand-mixing them — see [[silverOrdersEnrichedItems]]) feeding
    * sort-merge LEFT joins on order_id; no aggregate sees unreduced
    * fact rows post-shuffle.
    */
  def silverOrdersEnriched(orders: DataFrame, lineitem: DataFrame,
      events: DataFrame): DataFrame =
    silverOrdersEnrichedFromSilver(silverOrders(orders),
      silverLineitem(lineitem), silverPayments(events), silverReviews(events))

  /** [[silverOrdersEnriched]] over ALREADY-cleansed silver inputs — the
    * pipeline DAG path (downstream of landed silver tables).
    */
  def silverOrdersEnrichedFromSilver(so: DataFrame, sl: DataFrame,
      sp: DataFrame, sr: DataFrame): DataFrame = {
    val paymentsAgg = sp
      .groupBy(col("user_id").as("pay_order_id")).agg(
      count(lit(1)).as("payment_count"),
      dsum(col("payment_value")).as("total_payment_value"),
      max(col("payment_sequential")).cast("int").as("max_installments"),
      array_join(sort_array(collect_set(col("payment_type"))), ",")
        .as("payment_types"))
    val reviewsAgg = sr
      .groupBy(col("user_id").as("rev_order_id")).agg(
      max(col("score")).as("review_score"),
      max(col("sentiment")).as("review_sentiment"),
      max(col("has_comment")).as("has_review_comment"))
    silverOrdersEnrichedItemsFromSilver(so, sl)
      .join(paymentsAgg, col("order_id") === col("pay_order_id"), "left")
      .join(reviewsAgg, col("order_id") === col("rev_order_id"), "left")
      .drop("pay_order_id", "rev_order_id")
      .withColumn("payment_count", coalesce(col("payment_count"), lit(0L)))
      .withColumn("total_payment_value",
        coalesce(col("total_payment_value"), lit(0.0)))
      .withColumn("max_installments", coalesce(col("max_installments"), lit(0)))
      .withColumn("has_review_comment",
        coalesce(col("has_review_comment"), lit(false)))
      .withColumn("order_quarter", date_trunc("quarter", col("order_date")))
      .withColumn("order_hour", hour(col("order_date")).cast("int"))
  }

  /** Enriched-view SQL body (no ORDER BY) — reusable as a CTE by gold oracles. */
  val silverOrdersEnrichedBodySql: String =
    """WITH so AS (
         SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           CASE WHEN o_orderstatus = 'O' THEN 'open'
                WHEN o_orderstatus = 'F' THEN 'fulfilled'
                ELSE 'pending' END AS order_status,
           o_totalprice AS total_price,
           CAST(o_orderdate AS DATE) AS order_date,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_code,
           lower(trim(substring(o_orderpriority, 3, 20))) AS priority_label,
           CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2 AS is_high_priority
         FROM orders
         WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
           AND o_orderstatus IN ('O','F','P') AND o_orderdate IS NOT NULL),
       sl AS (
         SELECT l_orderkey AS order_id, l_partkey AS product_id,
           l_suppkey AS seller_id, l_extendedprice AS price,
           l_extendedprice * l_tax AS freight_value,
           l_extendedprice + l_extendedprice * l_tax AS total_item_value,
           l_returnflag AS return_flag, CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_linenumber > 0
           AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
           AND l_quantity > 0 AND l_extendedprice >= 0
           AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0),
       agg AS (
         SELECT order_id,
           COUNT(*) AS item_count,
           COUNT(DISTINCT product_id) AS unique_products,
           COUNT(DISTINCT seller_id) AS unique_sellers,
           CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS items_price,
           CAST(SUM(CAST(freight_value AS DECIMAL(18,4))) AS DOUBLE) AS items_freight,
           CAST(SUM(CAST(total_item_value AS DECIMAL(18,4))) AS DOUBLE) AS items_total_value,
           CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(CAST(price AS DECIMAL(18,4))) AS avg_item_price,
           MAX(ship_date) AS last_ship_date,
           MIN(ship_date) AS first_ship_date,
           array_to_string(list_sort(list_distinct(list(return_flag))), ',')
             AS return_flags
         FROM sl GROUP BY order_id)
       SELECT so.order_id, so.customer_id, so.order_status, so.total_price,
         so.order_date, so.order_month, so.order_year, so.priority_code,
         so.priority_label, so.is_high_priority,
         COALESCE(agg.item_count, 0) AS item_count,
         COALESCE(agg.unique_products, 0) AS unique_products,
         COALESCE(agg.unique_sellers, 0) AS unique_sellers,
         COALESCE(agg.items_price, 0.0) AS items_price,
         COALESCE(agg.items_freight, 0.0) AS items_freight,
         COALESCE(agg.items_total_value, 0.0) AS items_total_value,
         agg.avg_item_price,
         agg.last_ship_date, agg.first_ship_date, agg.return_flags,
         so.order_status = 'fulfilled' AS is_fulfilled,
         so.order_status = 'open' AS is_open,
         datediff('day', so.order_date, agg.last_ship_date) AS days_to_last_ship
       FROM so LEFT JOIN agg ON so.order_id = agg.order_id"""

  /** Full enriched-view oracle: items body + payments/reviews aggregate
    * CTEs + quarter/hour dims. DuckDB date_trunc on DATE returns DATE,
    * so the quarter dim casts through TIMESTAMP to match Spark's
    * timestamp-typed date_trunc (parity rule SURVEY §3.4).
    */
  val silverOrdersEnrichedFullBodySql: String =
    s"""WITH enr AS ($silverOrdersEnrichedBodySql),
       sp AS (
         SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS INT)
             AS payment_sequential,
           event_type AS payment_type,
           CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) AS payment_value
         FROM events
         WHERE event_id IS NOT NULL AND user_id IS NOT NULL
           AND value IS NOT NULL AND value >= 0
           AND event_type IN ('click', 'error', 'purchase', 'signup', 'view')),
       pa AS (
         SELECT user_id,
           COUNT(*) AS payment_count,
           CAST(SUM(CAST(payment_value AS DECIMAL(18,4))) AS DOUBLE)
             AS total_payment_value,
           CAST(MAX(payment_sequential) AS INT) AS max_installments,
           array_to_string(list_sort(list_distinct(list(payment_type))), ',')
             AS payment_types
         FROM sp GROUP BY user_id),
       ra AS (
         SELECT user_id,
           CAST(MAX(event_id % 5 + 1) AS INT) AS review_score,
           MAX(CASE WHEN event_id % 5 + 1 >= 4 THEN 'positive'
                    WHEN event_id % 5 + 1 = 3 THEN 'neutral'
                    ELSE 'negative' END) AS review_sentiment,
           bool_or(props IS NOT NULL AND length(trim(props)) > 0)
             AS has_review_comment
         FROM events
         WHERE event_id IS NOT NULL AND user_id IS NOT NULL
         GROUP BY user_id)
       SELECT enr.*,
         COALESCE(pa.payment_count, 0) AS payment_count,
         COALESCE(pa.total_payment_value, 0.0) AS total_payment_value,
         COALESCE(pa.max_installments, 0) AS max_installments,
         pa.payment_types,
         ra.review_score,
         ra.review_sentiment,
         COALESCE(ra.has_review_comment, FALSE) AS has_review_comment,
         date_trunc('quarter', CAST(enr.order_date AS TIMESTAMP)) AS order_quarter,
         CAST(hour(CAST(enr.order_date AS TIMESTAMP)) AS INT) AS order_hour
       FROM enr
       LEFT JOIN pa ON enr.order_id = pa.user_id
       LEFT JOIN ra ON enr.order_id = ra.user_id"""

  val silverOrdersEnrichedSql: String =
    silverOrdersEnrichedFullBodySql + "\n       ORDER BY 1"

  /** Payments-silver analog over the events feed (ref silver/
    * order_payments.sql:9-56): domain-validated rows with a per-key
    * payment sequential (row_number — the one shuffle), normalized
    * type, derived category map, and an exact decimal(10,2) value.
    * user_id stands in for order_id, event_type for payment_type.
    */
  def silverPayments(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull && col("value") >= 0 &&
        col("event_type").isin("click", "error", "purchase", "signup", "view"))
      .withColumn("payment_sequential", row_number().over(w))
      .select(
        col("event_id"), col("user_id"), col("payment_sequential"),
        col("event_type").as("payment_type"),
        when(col("event_type") === "purchase", "revenue")
          .when(col("event_type") === "signup", "acquisition")
          .when(col("event_type").isin("click", "view"), "engagement")
          .otherwise("ops").as("payment_category"),
        col("value").cast(DecimalType(10, 2)).cast("double")
          .as("payment_value"))
  }

  val silverPaymentsSql: String =
    """SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS INT)
         AS payment_sequential,
       event_type AS payment_type,
       CASE WHEN event_type = 'purchase' THEN 'revenue'
            WHEN event_type = 'signup' THEN 'acquisition'
            WHEN event_type IN ('click', 'view') THEN 'engagement'
            ELSE 'ops' END AS payment_category,
       CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) AS payment_value
       FROM events
       WHERE event_id IS NOT NULL AND user_id IS NOT NULL
         AND value IS NOT NULL AND value >= 0
         AND event_type IN ('click', 'error', 'purchase', 'signup', 'view')
       ORDER BY event_id"""

  /** Reviews-silver analog over the events feed (ref silver/
    * order_reviews.sql:9-63): a validated 1-5 score (synthesized
    * deterministically from the id — the feed has no rating column),
    * the reference's sentiment CASE-map, a response-time day count
    * (days since the user's previous event, via one lag window — the
    * answer-minus-creation DATEDIFF analog, computed in the µs domain
    * since the feed timestamps are nanos), and a has_comment flag from
    * the props payload.
    */
  def silverReviews(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .filter(col("event_id").isNotNull && col("user_id").isNotNull)
      .withColumn("score", (pmod(col("event_id"), lit(5)) + 1).cast("int"))
      // ts_us comes from Tables.events — the single home of the
      // ns→µs parity rule
      .withColumn("day_idx", expr("ts_us div 86400000000"))
      .withColumn("prev_day_idx", lag(col("day_idx"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("score"),
        when(col("score") >= 4, "positive")
          .when(col("score") === 3, "neutral")
          .otherwise("negative").as("sentiment"),
        (col("day_idx") - col("prev_day_idx")).cast("long")
          .as("response_days"),
        (col("props").isNotNull && length(trim(col("props"))) > 0)
          .as("has_comment"))
  }

  val silverReviewsSql: String =
    """SELECT event_id, user_id,
       CAST(event_id % 5 + 1 AS INT) AS score,
       CASE WHEN event_id % 5 + 1 >= 4 THEN 'positive'
            WHEN event_id % 5 + 1 = 3 THEN 'neutral'
            ELSE 'negative' END AS sentiment,
       CAST(epoch_us(ts) // 86400000000
         - lag(epoch_us(ts) // 86400000000, 1)
             OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
         AS response_days,
       (props IS NOT NULL AND length(trim(props)) > 0) AS has_comment
       FROM events
       WHERE event_id IS NOT NULL AND user_id IS NOT NULL
       ORDER BY event_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bronze_ingest" -> ((s, d) =>
      bronzeIngest(Tables.orders(s, d), "orders").orderBy(col("o_orderkey"))),
    "silver_lineitem" -> ((s, d) =>
      silverLineitem(Tables.lineitem(s, d))
        .orderBy(col("order_id"), col("line_number"))),
    "silver_orders" -> ((s, d) =>
      silverOrders(Tables.orders(s, d)).orderBy(col("order_id"))),
    "silver_customers" -> ((s, d) =>
      silverCustomers(Tables.customer(s, d), Tables.nation(s, d),
        Tables.region(s, d)).orderBy(col("customer_id"))),
    "silver_products" -> ((s, d) =>
      silverProducts(Tables.part(s, d)).orderBy(col("product_id"))),
    "silver_sellers" -> ((s, d) =>
      silverSellers(Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d)).orderBy(col("seller_id"))),
    "silver_geolocation" -> ((s, d) =>
      silverGeolocation(Tables.customer(s, d), Tables.nation(s, d),
        Tables.region(s, d)).orderBy(col("nation_id"), col("mktsegment"))),
    "silver_orders_enriched" -> ((s, d) =>
      silverOrdersEnriched(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.events(s, d)).orderBy(col("order_id"))),
    "silver_payments" -> ((s, d) =>
      silverPayments(Tables.events(s, d)).orderBy(col("event_id"))),
    "silver_reviews" -> ((s, d) =>
      silverReviews(Tables.events(s, d)).orderBy(col("event_id"))))

  def oracles: Map[String, String] = Map(
    "bronze_ingest" -> bronzeIngestSql,
    "silver_lineitem" -> silverLineitemSql,
    "silver_orders" -> silverOrdersSql,
    "silver_customers" -> silverCustomersSql,
    "silver_products" -> silverProductsSql,
    "silver_sellers" -> silverSellersSql,
    "silver_geolocation" -> silverGeolocationSql,
    "silver_orders_enriched" -> silverOrdersEnrichedSql,
    "silver_payments" -> silverPaymentsSql,
    "silver_reviews" -> silverReviewsSql)
}
