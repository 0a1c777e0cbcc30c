package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Medallion.dsum

/** Second tranche of decision-support shapes (TPC-H Q7/Q8/Q10/Q12/Q15
  * analogs): bi-directional nation-pair volume, market-share
  * conditional aggregation over a 6-way join, top-N returned-revenue
  * customers with a deterministic tiebreak, shipping-delay priority
  * buckets, and max-over-aggregate with ties kept. The driver schema
  * has no partsupp/shipmode columns, so Q2/Q11/Q16/Q20 have no analog
  * and Q12's shipmode axis becomes a shipping-delay bucket axis.
  *
  * Scale posture shared by all five: dimension chains
  * (supplier⋈nation, customer⋈nation⋈region) collapse to broadcast
  * builds BEFORE touching a fact; fact-to-fact (orders⋈lineitem)
  * shuffles once on the join key; every date/flag predicate sits on
  * the fact scan, not after a join.
  */
object TpchShapes2 {

  /** Q7 shape: shipping volume between two regions, both directions,
    * by ship year. (Region grain rather than classic nation grain: the
    * sf0.001 smoke data has suppliers in only 10 of 25 nations, so any
    * fixed nation pair can be structurally empty; every region is
    * populated at every SF.) Both dim chains are region-filtered
    * before broadcast — lineitem⋈supplier⋈nation⋈region keeps only the
    * two regions' suppliers' lines, orders⋈customer⋈nation⋈region only
    * the two regions' customers' orders — so the one fact-fact shuffle
    * moves only candidate rows. The cross-direction predicate (supp ≠
    * cust region) is the only post-join filter.
    */
  def q7RegionVolume(li: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val pair = Seq("AMERICA", "EUROPE")
    val regN = nation
      .join(region.filter(col("r_name").isin(pair: _*)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val supR = broadcast(supplier
      .join(regN, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region")))
    val custR = broadcast(customer
      .join(regN, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("r_name").as("cust_region")))
    val liS = li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(supR, col("l_suppkey") === col("s_suppkey"))
    val ordC = orders.select("o_orderkey", "o_custkey")
      .join(custR, col("o_custkey") === col("c_custkey"))
    liS.join(ordC, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("volume"),
        count(lit(1)).as("line_count"))
  }

  val q7Sql: String =
    """SELECT supp_region, cust_region, ship_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume,
       COUNT(*) AS line_count
       FROM (SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               l_extendedprice, l_discount
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ns ON s_nationkey = ns.n_nationkey
             JOIN region rs ON ns.n_regionkey = rs.r_regionkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation nc ON c_nationkey = nc.n_nationkey
             JOIN region rc ON nc.n_regionkey = rc.r_regionkey
             WHERE rs.r_name IN ('AMERICA','EUROPE')
               AND rc.r_name IN ('AMERICA','EUROPE')
               AND rs.r_name <> rc.r_name
               AND l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1998-01-01')
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Q8 shape: the target nation's share of PROMO-part revenue sold to
    * one region's customers, per order year. The share is one IEEE
    * division of two exact conditional decimal sums; the six-way join
    * is three broadcast dims (part filtered to PROMO, supplier⋈nation,
    * customer⋈nation⋈region filtered to the region) around the single
    * orders⋈lineitem shuffle.
    */
  def q8MarketShare(li: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      part: DataFrame): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(24, 6))
    val promo = broadcast(part.filter(col("p_type") === "PROMO")
      .select("p_partkey"))
    val supN = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val asiaCust = broadcast(customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey")))
    val ord = orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
    li.join(promo, col("l_partkey") === col("p_partkey"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast(DecimalType(24, 6))))
          .cast("double").as("nation_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("market_share",
        col("nation_revenue") / col("total_revenue"))
  }

  val q8Sql: String =
    """SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS market_share
       FROM (SELECT ns.n_name AS supp_nation,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               l_extendedprice, l_discount
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ns ON s_nationkey = ns.n_nationkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation nc ON c_nationkey = nc.n_nationkey
             JOIN region ON nc.n_regionkey = r_regionkey
             WHERE p_type = 'PROMO' AND r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate < TIMESTAMP '1999-01-01')
       GROUP BY 1 ORDER BY 1"""

  /** Q10 shape: top-20 customers by returned revenue in a quarter.
    * Both scan predicates (return flag, date window) sit on their own
    * fact scans; the rollup happens at customer grain BEFORE the
    * customer dim join, so only 20 aggregated rows reach the dim. The
    * tiebreak (revenue DESC, custkey ASC) makes top-N deterministic.
    */
  def q10ReturnedCustomers(li: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame = {
    val returned = li.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = orders
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val top = returned
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("returned_revenue"))
      .orderBy(col("returned_revenue").desc, col("o_custkey"))
      .limit(20)
    broadcast(top)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("n_name").as("nation"),
        col("c_acctbal").as("acct_balance"),
        col("returned_revenue"))
  }

  val q10Sql: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name,
       n_name AS nation, c_acctbal AS acct_balance, returned_revenue
       FROM (SELECT o_custkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS returned_revenue
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE l_returnflag = 'R'
               AND o_orderdate >= TIMESTAMP '1997-07-01'
               AND o_orderdate < TIMESTAMP '1997-10-01'
             GROUP BY 1
             ORDER BY returned_revenue DESC, o_custkey LIMIT 20)
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       ORDER BY returned_revenue DESC, customer_id"""

  /** Q12 shape (delay-bucket axis): high- vs low-priority line counts
    * per shipping-delay bucket. One orders⋈lineitem shuffle with both
    * sides pre-projected; the bucket and the priority split are
    * integer/flag expressions — map-side combinable conditional
    * counts, the Q12 aggregation pattern exactly.
    */
  def q12DelayPriority(li: DataFrame, orders: DataFrame): DataFrame = {
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    val bucket = when(delay <= 30, "0-30")
      .when(delay <= 90, "31-90").otherwise("90+")
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.select("l_orderkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(bucket.as("delay_bucket"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_priority_lines"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_priority_lines"))
  }

  val q12Sql: String =
    """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
                   WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '31-90'
                   ELSE '90+' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1 ORDER BY 1"""

  /** Q15 shape: supplier(s) with the maximum quarterly revenue, ties
    * kept. The global max arrives as a broadcast single-row join
    * against the per-supplier rollup (the view + scalar-subquery
    * analog) — never a driver collect, never an unpartitioned window.
    * Revenue equality is exact: both sides are the same decimal sum
    * cast to double.
    */
  def q15TopSupplier(li: DataFrame, supplier: DataFrame): DataFrame = {
    val perSupp = li
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val top = perSupp.agg(max(col("total_revenue")).as("max_revenue"))
    perSupp
      .join(broadcast(top), col("total_revenue") === col("max_revenue"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").as("supplier_id"),
        col("s_name").as("supplier_name"), col("total_revenue"))
  }

  val q15Sql: String =
    """WITH revenue AS (
         SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-04-01'
         GROUP BY 1)
       SELECT s_suppkey AS supplier_id, s_name AS supplier_name, total_revenue
       FROM revenue JOIN supplier ON l_suppkey = s_suppkey
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       ORDER BY 1"""

  /** Q6 shape: the forecast-revenue scan-aggregate — three pushable
    * scan predicates, no join, one exact-decimal conditional sum. The
    * whole plan is a single WholeStageCodegen span over the pruned
    * scan; at 100 TB this is the query whose cost IS the IO, so
    * anything beyond scan+partial-agg would be overhead.
    */
  def q6ForecastRevenue(li: DataFrame): DataFrame = li
    .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
      col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
    .agg(dsum(col("l_extendedprice") * col("l_discount"))
      .as("forecast_revenue"),
      count(lit(1)).as("line_count"))

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS forecast_revenue,
       COUNT(*) AS line_count
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_region_volume" -> ((s, d) =>
      q7RegionVolume(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d))
        .orderBy(col("supp_region"), col("cust_region"), col("ship_year"))),
    "q8_market_share" -> ((s, d) =>
      q8MarketShare(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d), Tables.part(s, d))
        .orderBy(col("order_year"))),
    "q10_returned_customers" -> ((s, d) =>
      q10ReturnedCustomers(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d))
        .orderBy(col("returned_revenue").desc, col("customer_id"))),
    "q12_delay_priority" -> ((s, d) =>
      q12DelayPriority(Tables.lineitem(s, d), Tables.orders(s, d))
        .orderBy(col("delay_bucket"))),
    "q15_top_supplier" -> ((s, d) =>
      q15TopSupplier(Tables.lineitem(s, d), Tables.supplier(s, d))
        .orderBy(col("supplier_id"))),
    "q6_forecast_revenue" -> ((s, d) =>
      q6ForecastRevenue(Tables.lineitem(s, d))))

  def oracles: Map[String, String] = Map(
    "q7_region_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q10_returned_customers" -> q10Sql,
    "q12_delay_priority" -> q12Sql,
    "q15_top_supplier" -> q15Sql,
    "q6_forecast_revenue" -> q6Sql)
}
