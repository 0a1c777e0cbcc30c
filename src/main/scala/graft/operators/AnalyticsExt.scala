package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructType}

import graft.Tables
import Medallion.dsum

/** Coverage extensions: semi-structured JSON extraction (the events
  * `props` payload parsed with a TYPED schema, not string hacks), a
  * RANGE-frame trailing window (date-gap-aware — distinct semantics
  * from the ROWS frames used by gold_revenue_7d_ma), and Pearson
  * correlation built from exact decimal sums so the float result is
  * bit-reproducible across engines and partitionings.
  */
object AnalyticsExt {

  // =========================================================================
  // events_json_breakdown — typed semi-structured extraction
  // =========================================================================
  /** Parse the JSON `props` column with `from_json` + an explicit
    * schema (codegen'd JacksonParser — no UDF, no regex), then roll up
    * by event type × payload-key decile. Malformed/missing JSON parses
    * to NULL and lands in the NULL bucket rather than failing the
    * pipeline — the PERMISSIVE contract bronze ingestion relies on.
    */
  def eventsJsonBreakdown(events: DataFrame): DataFrame = {
    val schema = new StructType().add("k", IntegerType)
    events
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .groupBy(col("event_type"), expr("k div 10").cast("int").as("k_decile"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
  }

  val eventsJsonBreakdownSql: String =
    """SELECT event_type,
       CAST(CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS INTEGER) AS k_decile,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM events
       GROUP BY 1, 2 ORDER BY 1, 2"""

  // =========================================================================
  // customer_trailing_spend — RANGE frame over a sparse per-customer axis
  // =========================================================================
  /** Trailing-90-day spend per customer order, via a RANGE frame on an
    * integer day index. Customers order on scattered days, so RANGE
    * (logical-offset) and ROWS (physical-offset) frames genuinely
    * differ here — this is the date-gap-aware half of the window
    * coverage. Same-day rows share one frame value by definition, so
    * the result is tie-deterministic without an orderBy tiebreak.
    */
  def customerTrailingSpend(orders: DataFrame): DataFrame = {
    val dayIdx = datediff(to_date(col("o_orderdate")),
      lit("1995-01-01").cast("date"))
    val base = orders.select(col("o_custkey").as("customer_id"),
      col("o_orderkey").as("order_id"),
      to_date(col("o_orderdate")).as("order_day"),
      dayIdx.as("day_idx"),
      col("o_totalprice").cast(DecimalType(18, 4)).as("price_d"))
    val w = Window.partitionBy(col("customer_id")).orderBy(col("day_idx"))
      .rangeBetween(-89, 0)
    base
      .withColumn("trailing_90d_spend", sum(col("price_d")).over(w)
        .cast("double"))
      .withColumn("n_orders_90d", count(lit(1)).over(w))
      .select(col("customer_id"), col("order_id"), col("order_day"),
        col("trailing_90d_spend"), col("n_orders_90d"))
  }

  val customerTrailingSpendSql: String =
    """SELECT o_custkey AS customer_id, o_orderkey AS order_id,
       CAST(o_orderdate AS DATE) AS order_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
         AS trailing_90d_spend,
       COUNT(*) OVER w AS n_orders_90d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
       ORDER BY customer_id, order_id"""

  // =========================================================================
  // lineitem_price_qty_corr — Pearson r from exact decimal moments
  // =========================================================================
  /** Pearson correlation of price vs quantity per return flag. The five
    * moments (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT decimals —
    * order-independent, so any partitioning gives the same bits — and
    * the final r uses only + − × ÷ sqrt on doubles, all IEEE-exact
    * cross-engine (§3.7). `corr()` itself would drift: its streaming
    * covariance update is partition-order dependent.
    */
  def lineitemPriceQtyCorr(li: DataFrame): DataFrame = {
    val x = col("l_extendedprice").cast(DecimalType(28, 8))
    val y = col("l_quantity").cast(DecimalType(28, 8))
    li.groupBy(col("l_returnflag").as("return_flag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(y).cast("double").as("sum_y"),
        sum((x * y).cast(DecimalType(38, 10))).cast("double").as("sum_xy"),
        sum((x * x).cast(DecimalType(38, 10))).cast("double").as("sum_xx"),
        sum((y * y).cast(DecimalType(38, 10))).cast("double").as("sum_yy"))
      .withColumn("pearson_r",
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (sqrt(col("n") * col("sum_xx") - col("sum_x") * col("sum_x")) *
            sqrt(col("n") * col("sum_yy") - col("sum_y") * col("sum_y"))))
      .select(col("return_flag"), col("n"), col("pearson_r"))
  }

  /** DuckDB mirror. Decimal→double via VARCHAR: DuckDB's direct wide-
    * decimal→double cast double-rounds; the string round-trip is exact.
    */
  val lineitemPriceQtyCorrSql: String = {
    def d(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    val sx = d("SUM(CAST(l_extendedprice AS DECIMAL(28,8)))")
    val sy = d("SUM(CAST(l_quantity AS DECIMAL(28,8)))")
    val sxy = d("SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,8)) * CAST(l_quantity AS DECIMAL(28,8)) AS DECIMAL(38,10)))")
    val sxx = d("SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,8)) * CAST(l_extendedprice AS DECIMAL(28,8)) AS DECIMAL(38,10)))")
    val syy = d("SUM(CAST(CAST(l_quantity AS DECIMAL(28,8)) * CAST(l_quantity AS DECIMAL(28,8)) AS DECIMAL(38,10)))")
    s"""SELECT return_flag, n,
        (n * sum_xy - sum_x * sum_y)
          / (sqrt(n * sum_xx - sum_x * sum_x)
             * sqrt(n * sum_yy - sum_y * sum_y)) AS pearson_r
        FROM (SELECT l_returnflag AS return_flag, COUNT(*) AS n,
                $sx AS sum_x, $sy AS sum_y, $sxy AS sum_xy,
                $sxx AS sum_xx, $syy AS sum_yy
              FROM lineitem GROUP BY 1)
        ORDER BY return_flag"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_breakdown" -> ((s, d) =>
      eventsJsonBreakdown(Tables.events(s, d))
        .orderBy(col("event_type"), col("k_decile"))),
    "customer_trailing_spend" -> ((s, d) =>
      customerTrailingSpend(Tables.orders(s, d))
        .orderBy(col("customer_id"), col("order_id"))),
    "lineitem_price_qty_corr" -> ((s, d) =>
      lineitemPriceQtyCorr(Tables.lineitem(s, d))
        .orderBy(col("return_flag"))))

  def oracles: Map[String, String] = Map(
    "events_json_breakdown" -> eventsJsonBreakdownSql,
    "customer_trailing_spend" -> customerTrailingSpendSql,
    "lineitem_price_qty_corr" -> lineitemPriceQtyCorrSql)
}
