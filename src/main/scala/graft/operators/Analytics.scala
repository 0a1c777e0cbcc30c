package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Medallion.{davg, dsum}

/** Analytics headliners: scan-heavy aggregate, join-heavy ranked query,
  * multi-way dimensional rollup, as-of join, and per-user window stats.
  * These are the bench workhorses and exercise the core relational
  * operator set (scan → filter → project → hash-agg → broadcast/shuffle
  * join → window → sort).
  */
object Analytics {

  /** Full-scan pricing summary (TPC-H Q1 shape). One pass over
    * lineitem; partial aggregation reduces each partition to ≤ a few
    * groups before the single tiny shuffle. At 100 TB this is scan
    * bound, which is the right bottleneck.
    */
  def q1PricingSummary(li: DataFrame): DataFrame = li
    // strict < next-day midnight: includes ALL of 1998-09-02 even for
    // non-midnight timestamps, matches the oracle exactly, and stays a
    // plain timestamp comparison (pushed to the parquet scan)
    .filter(col("l_shipdate") < lit("1998-09-03").cast("date"))
    .groupBy(col("l_returnflag").as("return_flag"),
      col("l_linestatus").as("line_status"))
    .agg(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_base_price"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 6))).cast("double")
        .as("sum_disc_price"),
      // charge carries 6 decimal places (2dp × 2dp × 2dp); aggregating at
      // scale 4 would round per-row and hit half-tie divergence vs DuckDB
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 6))).cast("double")
        .as("sum_charge"),
      davg(col("l_quantity")).as("avg_qty"),
      davg(col("l_extendedprice")).as("avg_price"),
      davg(col("l_discount")).as("avg_disc"),
      count(lit(1)).as("count_order"))

  val q1Sql: String =
    """SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(CAST(l_quantity AS DECIMAL(18,4))) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(CAST(l_extendedprice AS DECIMAL(18,4))) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(CAST(l_discount AS DECIMAL(18,4))) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** Ranked revenue per order for open orders (TPC-H Q3 shape).
    * Joins are unhinted: AQE broadcasts the filtered customer side when
    * it is small and falls back to shuffle joins at scale; lineitem
    * shuffles once on order_id.
    */
  def q3TopOrders(customer: DataFrame, orders: DataFrame,
      li: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    orders.filter(col("o_orderstatus") === "O")
      .join(cust, col("o_custkey") === col("c_custkey")) // AQE broadcasts when small; customer scales with SF
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey").as("order_id"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority").as("order_priority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .filter(col("revenue") > 0)
  }

  val q3Sql: String =
    """SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority AS order_priority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
       GROUP BY 1, 2, 3
       HAVING CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) > 0
       ORDER BY order_id"""

  /** Multi-way dimensional rollup (TPC-H Q5 shape): revenue by nation
    * where customer and supplier share the nation. Only the constant-
    * size dims (nation, region) are broadcast-hinted; supplier and
    * customer scale with SF, so their join strategy is left to
    * statistics + AQE.
    */
  def q5RegionRevenue(customer: DataFrame, orders: DataFrame, li: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    orders
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(trim(col("r_name")).as("region_name"),
        trim(col("n_name")).as("nation_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("line_count"))
  }

  val q5Sql: String =
    """SELECT trim(r_name) AS region_name, trim(n_name) AS nation_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
       FROM orders
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** As-of join: attach to every event the most recent signup event
    * (same user, ts <= event ts). Composed Spark-first: union the two
    * streams tagged, one window pass per user ordered by time — a
    * single shuffle on user_id, no range join / no crossJoin. This is
    * the scalable shape for "join each fact to latest-prior dim state".
    */
  def eventsAsOf(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"),
        col("event_id").as("signup_event_id"))
    val facts = events.select("event_id", "user_id", "ts", "event_type", "value")
    // union-tag trick: signups carry their id, facts carry null; the
    // running last_value over (user, time) is the as-of match.
    val tagged = facts
      .withColumn("signup_event_id", lit(null).cast("long"))
      .withColumn("is_fact", lit(1))
      .unionByName(signups.select(
        col("signup_event_id").as("event_id"), col("user_id"),
        col("signup_ts").as("ts"),
        lit("signup_marker").as("event_type"),
        lit(null).cast("double").as("value"),
        col("signup_event_id"), lit(0).as("is_fact")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_fact"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("asof_signup_id",
        last(col("signup_event_id"), ignoreNulls = true).over(w))
      .filter(col("is_fact") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("asof_signup_id"))
  }

  val eventsAsOfSql: String =
    """SELECT e.event_id, e.user_id, e.event_type, e.value,
         s.event_id AS asof_signup_id
       FROM events e
       ASOF LEFT JOIN (
         SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
       ) s ON e.user_id = s.user_id AND e.ts >= s.ts
       ORDER BY e.event_id"""

  /** Per-user lifetime stats via window + agg: first/last event, counts,
    * exact-decimal value totals. Single shuffle on user_id.
    */
  def eventsUserStats(events: DataFrame): DataFrame = events
    .groupBy(col("user_id"))
    .agg(
      count(lit(1)).as("event_count"),
      countDistinct(col("event_type")).as("distinct_event_types"),
      min(col("event_id")).as("first_event_id"),
      max(col("event_id")).as("last_event_id"),
      dsum(col("value")).as("total_value"),
      davg(col("value")).as("avg_value"),
      count(when(col("event_type") === "purchase", 1)).as("purchase_count"),
      dsum(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(null))).as("purchase_value"))

  val eventsUserStatsSql: String =
    """SELECT user_id,
       COUNT(*) AS event_count,
       COUNT(DISTINCT event_type) AS distinct_event_types,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(CAST(value AS DECIMAL(18,4))) AS avg_value,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
       CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
         AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value
       FROM events
       GROUP BY user_id
       ORDER BY user_id"""

  /** Funnel analysis: signup → later click → later purchase, per user,
    * rolled up to one row. Two window passes on the single user_id
    * shuffle (conditional mins over ns-exact timestamps), then a global
    * aggregate.
    */
  def eventsFunnel(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("signup_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("click_ts",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("signup_ts"), col("ts"))).over(byUser))
      .withColumn("purchase_ts",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("click_ts"), col("ts"))).over(byUser))
    staged.groupBy(col("user_id"))
      .agg(
        max(col("signup_ts").isNotNull).as("did_signup"),
        max(col("click_ts").isNotNull).as("did_click_after_signup"),
        max(col("purchase_ts").isNotNull).as("did_full_funnel"))
      .agg(
        count(lit(1)).as("n_users"),
        count(when(col("did_signup"), 1)).as("n_signup"),
        count(when(col("did_click_after_signup"), 1)).as("n_signup_click"),
        count(when(col("did_full_funnel"), 1)).as("n_full_funnel"))
  }

  val eventsFunnelSql: String =
    """WITH staged AS (
         SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END)
             OVER (PARTITION BY user_id) AS signup_ts,
           ts, event_type
         FROM events),
       staged2 AS (
         SELECT user_id, signup_ts, ts, event_type,
           MIN(CASE WHEN event_type = 'click' AND ts >= signup_ts THEN ts END)
             OVER (PARTITION BY user_id) AS click_ts
         FROM staged),
       staged3 AS (
         SELECT user_id, signup_ts, click_ts,
           MIN(CASE WHEN event_type = 'purchase' AND ts >= click_ts THEN ts END)
             OVER (PARTITION BY user_id) AS purchase_ts
         FROM staged2),
       per_user AS (
         SELECT user_id,
           MAX(signup_ts IS NOT NULL) AS did_signup,
           MAX(click_ts IS NOT NULL) AS did_click_after_signup,
           MAX(purchase_ts IS NOT NULL) AS did_full_funnel
         FROM staged3
         GROUP BY user_id)
       SELECT COUNT(*) AS n_users,
         COUNT(CASE WHEN did_signup THEN 1 END) AS n_signup,
         COUNT(CASE WHEN did_click_after_signup THEN 1 END) AS n_signup_click,
         COUNT(CASE WHEN did_full_funnel THEN 1 END) AS n_full_funnel
       FROM per_user"""

  /** CONVERSION-WINDOW funnel — [[eventsFunnel]] with per-step time
    * budgets (click within 7 days of signup, purchase within 7 days of
    * that click), the product-analytics grain unbounded funnels
    * overstate: a purchase two years after signup is not a conversion.
    * Same one-user-shuffle shape (three conditional MIN windows over
    * the exact microsecond domain — BIGINT arithmetic, no timestamp
    * intervals to drift cross-engine), plus the exact total
    * signup→purchase latency of full-funnel users as an integer sum.
    */
  def eventsWindowFunnel(events: DataFrame): DataFrame = {
    val W = 604800000000L // 7 days in micros
    val byUser = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("s_us",
        min(when(col("event_type") === "signup", col("ts_us"))).over(byUser))
      .withColumn("c_us",
        min(when(col("event_type") === "click" &&
          col("ts_us") >= col("s_us") &&
          col("ts_us") <= col("s_us") + W, col("ts_us"))).over(byUser))
      .withColumn("p_us",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("c_us") &&
          col("ts_us") <= col("c_us") + W, col("ts_us"))).over(byUser))
    staged.groupBy(col("user_id"))
      .agg(max(col("s_us")).as("s"), max(col("c_us")).as("c"),
        max(col("p_us")).as("p"))
      .agg(count(lit(1)).as("n_users"),
        count(col("s")).as("n_signup"),
        count(col("c")).as("n_click_7d"),
        count(col("p")).as("n_full_7d"),
        coalesce(sum(when(col("p").isNotNull, col("p") - col("s"))),
          lit(0L)).cast("long").as("total_convert_us"))
  }

  val eventsWindowFunnelSql: String =
    """WITH e AS (
         SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       s1 AS (
         SELECT user_id, event_type, ts_us,
           MIN(CASE WHEN event_type = 'signup' THEN ts_us END)
             OVER (PARTITION BY user_id) AS s
         FROM e),
       s2 AS (
         SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us >= s
             AND ts_us <= s + 604800000000 THEN ts_us END)
             OVER (PARTITION BY user_id) AS c
         FROM s1),
       s3 AS (
         SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us >= c
             AND ts_us <= c + 604800000000 THEN ts_us END)
             OVER (PARTITION BY user_id) AS p
         FROM s2),
       u AS (
         SELECT user_id, MAX(s) AS s, MAX(c) AS c, MAX(p) AS p
         FROM s3 GROUP BY user_id)
       SELECT COUNT(*) AS n_users, COUNT(s) AS n_signup,
         COUNT(c) AS n_click_7d, COUNT(p) AS n_full_7d,
         CAST(COALESCE(SUM(CASE WHEN p IS NOT NULL THEN p - s END), 0)
           AS BIGINT) AS total_convert_us
       FROM u"""

  /** HyperLogLog++ distinct sketch, oracle-gated via its error bound:
    * the sketch value itself is engine-specific, but "within 10% of the
    * exact count at rsd=0.02" is a deterministic boolean the oracle can
    * assert alongside the exact counts (the sketch still runs — the
    * flag is computed from it).
    */
  def eventsApproxUsers(events: DataFrame): DataFrame = events
    .groupBy(col("event_type"))
    .agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
      count(lit(1)).as("n_events"))
    .select(col("event_type"), col("exact_users"), col("n_events"),
      // all-NULL-user groups give exact=0: no meaningful bound, but the
      // oracle emits true — avoid a NULL from the 0-division
      when(col("exact_users") === 0, lit(true))
        .otherwise(abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.10)
        .as("approx_within_10pct"))

  val eventsApproxUsersSql: String =
    """SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       true AS approx_within_10pct
       FROM events
       GROUP BY event_type
       ORDER BY event_type"""

  /** Quantile SKETCH with a verified error bound — the scale path for
    * percentiles: [[orderPriceQuantiles]] is exact (full sort per
    * group); `percentile_approx` (Greenwald-Khanna) is mergeable
    * partial state of bounded size, the only form that works on a
    * 100 TB stream. The sketch's contract — rank error ≤ n/accuracy —
    * is ASSERTED per group by ranking the sketch's answer against the
    * actual data (same bound-oracle pattern as [[eventsApproxUsers]]
    * and the ANN recall floors: the approximate value itself is not
    * portable across engines, but its guarantee is checkable exactly).
    */
  def priceQuantilesSketch(lineitem: DataFrame): DataFrame = {
    val acc = 1000
    val sk = lineitem.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.95)), lit(acc)).as("ap"),
        count(lit(1)).as("n"))
    lineitem
      .join(broadcast(sk), "l_returnflag") // 3 sketch rows: broadcast
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_extendedprice") <= col("ap")(0), 1L).otherwise(0L))
          .as("rank50"),
        sum(when(col("l_extendedprice") <= col("ap")(1), 1L).otherwise(0L))
          .as("rank95"),
        max(col("n")).as("n"))
      .select(col("l_returnflag"), col("n"),
        (abs(col("rank50") - col("n") / 2) <= col("n") / acc + 1)
          .as("p50_within_bound"),
        (abs(col("rank95") - col("n") * 19 / 20) <= col("n") / acc + 1)
          .as("p95_within_bound"))
  }

  val priceQuantilesSketchSql: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       true AS p50_within_bound, true AS p95_within_bound
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  /** Range join by GRID BUCKETING — the scalable re-expression of the
    * theta join `fact.v BETWEEN band.lo AND band.hi`: each band row is
    * exploded to the fixed-width grid cells it covers, facts compute
    * their cell in O(1), and the join becomes a plain equi-join on the
    * cell followed by the exact bound filter. A band table of ANY size
    * then joins with a shuffle/broadcast hash join instead of the
    * BroadcastNestedLoopJoin Spark falls back to for interval
    * predicates (which is quadratic work and requires one side to fit
    * in memory). Fan-out = ceil(width/grid) cells per band — bounded
    * and chosen, not data-dependent.
    */
  def priceBandJoin(li: DataFrame): DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    val cells = PriceBands.toDF("band_name", "lo", "hi")
      .withColumn("cell", explode(sequence(
        expr(s"lo div $BandGrid"), expr(s"(hi - 1) div $BandGrid"))))
    val facts = li.withColumn("cell",
      expr(s"CAST(floor(l_extendedprice / $BandGrid.0) AS BIGINT)"))
    facts.join(cells,
      facts("cell") === cells("cell") &&
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band_name"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  // non-uniform bands covering the l_extendedprice domain; grid = gcd-ish
  val BandGrid = 2000
  val PriceBands: Seq[(String, Long, Long)] = Seq(
    ("p0_2k", 0L, 2000L), ("p2k_10k", 2000L, 10000L),
    ("p10k_30k", 10000L, 30000L), ("p30k_60k", 30000L, 60000L),
    ("p60k_120k", 60000L, 120000L))

  val priceBandJoinSql: String = {
    val vals = PriceBands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }
      .mkString(", ")
    s"""SELECT band_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       FROM lineitem
       JOIN (VALUES $vals) b(band_name, lo, hi)
         ON l_extendedprice >= lo AND l_extendedprice < hi
       GROUP BY band_name
       ORDER BY band_name"""
  }

  /** Rank-function family over event values within each type: rank,
    * dense_rank, percent_rank, ntile — top 20 per type via the rank
    * filter. Note: percent_rank/ntile are size-based window functions
    * needing the full partition, so this window does NOT get the
    * WindowGroupLimit partial-top-k rewrite (the rank-only ANN windows
    * do); the full per-type partition is window-processed here by
    * design.
    */
  def eventsValueRanks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("quartile", ntile(4).over(w).cast("int"))
      .filter(col("rnk") <= 20)
  }

  val eventsValueRanksSql: String =
    """WITH ranked AS (
         SELECT event_id, event_type, value,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
           percent_rank() OVER w AS pct_rank,
           CAST(ntile(4) OVER w AS INT) AS quartile
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id))
       SELECT * FROM ranked WHERE rnk <= 20
       ORDER BY event_type, rnk, event_id"""

  /** Cheapest product per category (TPC-H Q2's correlated-min shape).
    * Expressed as a window min rather than a correlated scalar
    * subquery — the rewrite Catalyst would want anyway: one shuffle on
    * the group key, no per-row subquery re-execution.
    */
  def cheapestPerCategory(part: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("category"))
    Medallion.silverProducts(part)
      .withColumn("min_price", min(col("retail_price")).over(w))
      .filter(col("retail_price") === col("min_price"))
      .select(col("category"), col("product_id"), col("retail_price"))
  }

  val cheapestPerCategorySql: String =
    """WITH sp AS (
         SELECT p_partkey AS product_id, lower(trim(p_type)) AS category,
           p_retailprice AS retail_price
         FROM part
         WHERE p_partkey IS NOT NULL AND (p_size IS NULL OR p_size >= 0))
       SELECT category, product_id, retail_price
       FROM sp
       WHERE retail_price = (SELECT MIN(retail_price) FROM sp s2
                             WHERE s2.category = sp.category)
       ORDER BY category, product_id"""

  /** Set operations: market segments present among customers of BOTH
    * probe nations (INTERSECT) and those exclusive to the first
    * (EXCEPT), tagged and unioned.
    */
  def segmentSetOps(customer: DataFrame): DataFrame = {
    val segA = customer.filter(col("c_nationkey") === 1)
      .select(lower(trim(col("c_mktsegment"))).as("mktsegment"))
    val segB = customer.filter(col("c_nationkey") === 2)
      .select(lower(trim(col("c_mktsegment"))).as("mktsegment"))
    segA.intersect(segB).withColumn("set_op", lit("in_both"))
      .unionByName(segA.except(segB).withColumn("set_op", lit("only_first")))
  }

  val segmentSetOpsSql: String =
    """WITH a AS (SELECT lower(trim(c_mktsegment)) AS mktsegment
                  FROM customer WHERE c_nationkey = 1),
         b AS (SELECT lower(trim(c_mktsegment)) AS mktsegment
                  FROM customer WHERE c_nationkey = 2)
       SELECT mktsegment, 'in_both' AS set_op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
       UNION ALL
       SELECT mktsegment, 'only_first' FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
       ORDER BY set_op, mktsegment"""

  /** Exact quantiles of order value per status (sort-based
    * `percentile` with linear interpolation — matches DuckDB's
    * quantile_cont bit-for-bit on the same doubles).
    */
  def orderPriceQuantiles(orders: DataFrame): DataFrame = orders
    .groupBy(col("o_orderstatus").as("order_status"))
    .agg(
      count(lit(1)).as("n_orders"),
      percentile(col("o_totalprice"), lit(0.25)).as("p25"),
      percentile(col("o_totalprice"), lit(0.5)).as("p50"),
      percentile(col("o_totalprice"), lit(0.75)).as("p75"),
      percentile(col("o_totalprice"), lit(0.95)).as("p95"))

  val orderPriceQuantilesSql: String =
    """SELECT o_orderstatus AS order_status,
       COUNT(*) AS n_orders,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75,
       quantile_cont(o_totalprice, 0.95) AS p95
       FROM orders
       GROUP BY 1
       ORDER BY 1"""

  /** Semi/anti join coverage: customers WITH any open order (EXISTS →
    * left_semi) and customers WITHOUT any order at all (NOT EXISTS →
    * left_anti). Both are single-shuffle joins that never materialize
    * the probe side's payload.
    */
  def customerOrderPresence(customer: DataFrame, orders: DataFrame): DataFrame = {
    val openOrders = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val anyOrders = orders.select(col("o_custkey"))
    val withOpen = customer
      .join(openOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey").as("customer_id"),
        lit("has_open_order").as("presence"))
    val withoutAny = customer
      .join(anyOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("customer_id"),
        lit("no_orders").as("presence"))
    withOpen.unionByName(withoutAny)
  }

  val customerOrderPresenceSql: String =
    """SELECT c_custkey AS customer_id, 'has_open_order' AS presence
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
       UNION ALL
       SELECT c_custkey, 'no_orders'
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       ORDER BY presence, customer_id"""

  /** Multi-dimensional subtotals: revenue by (region, nation) with
    * ROLLUP — region subtotals and a grand total in one aggregation
    * pass (grouping-sets expansion happens map-side, still a single
    * shuffle).
    */
  def revenueRollup(orders: DataFrame, customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame = {
    val cust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), trim(col("n_name")).as("nation_name"),
        trim(col("r_name")).as("region_name"))
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .rollup(col("region_name"), col("nation_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"),
        grouping_id().as("grouping_level"))
  }

  val revenueRollupSql: String =
    """SELECT trim(r_name) AS region_name, trim(n_name) AS nation_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(GROUPING(trim(r_name)) * 2 + GROUPING(trim(n_name)) AS BIGINT)
         AS grouping_level
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (trim(r_name), trim(n_name))
       ORDER BY grouping_level, region_name, nation_name"""

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT join so
    * order-less customers land in the zero bucket, then a histogram of
    * the per-customer counts. Two aggregations, both map-side
    * combinable; the second one's input is already O(customers).
    */
  def customerOrderHistogram(customer: DataFrame,
      orders: DataFrame): DataFrame = customer
    .join(orders, col("c_custkey") === col("o_custkey"), "left")
    .groupBy(col("c_custkey"))
    .agg(count(col("o_orderkey")).as("order_count"))
    .groupBy(col("order_count"))
    .agg(count(lit(1)).as("customer_count"))

  val customerOrderHistogramSql: String =
    """SELECT order_count, COUNT(*) AS customer_count
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS order_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey)
       GROUP BY order_count
       ORDER BY order_count"""

  /** Solo-late-supplier analysis (TPC-H Q21 shape, adapted to the
    * columns this schema has): for multi-supplier orders, find the
    * supplier who was the ONLY one to ship late (> 90 days after the
    * order date) and count such orders per supplier. The classic
    * formulation is EXISTS + NOT EXISTS self-joins; one grouped pass
    * over the order's lines (distinct-supplier counts + the
    * conditional max) replaces both correlated subqueries — lineitem
    * shuffles once on order key instead of three times.
    */
  def supplierLateSolo(orders: DataFrame, li: DataFrame,
      supplier: DataFrame): DataFrame = {
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perOrder = li
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_suppliers"),
        max(when(late, col("l_suppkey"))).as("late_supplier"))
      .filter(col("n_suppliers") > 1 && col("n_late_suppliers") === 1)
    perOrder
      .groupBy(col("late_supplier").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"),
        trim(col("s_name")).as("supplier_name"))), Seq("s_suppkey"))
  }

  val supplierLateSoloSql: String =
    """WITH per_order AS (
         SELECT o_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             THEN l_suppkey END) AS n_late_suppliers,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             THEN l_suppkey END) AS late_supplier
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey)
       SELECT late_supplier AS s_suppkey,
         COUNT(*) AS numwait,
         trim(s_name) AS supplier_name
       FROM per_order
       JOIN supplier ON s_suppkey = late_supplier
       WHERE n_suppliers > 1 AND n_late_suppliers = 1
       GROUP BY late_supplier, trim(s_name)
       ORDER BY s_suppkey"""

  /** Event-type affinity — the market-basket shape (support and lift
    * per unordered type pair, over users as baskets). The self-join
    * runs on the deduplicated (user, type) table — at most 5 rows per
    * user — so the pair fan-out is O(users·10), and the tiny per-type
    * count table joins back by broadcast. The single driver-side
    * `count()` fetches N (one long of model state) to keep lift free of
    * a 1-row cross join. All ratios are integer-exact counts pushed
    * into one fixed-order double expression (§3.7-safe).
    */
  def eventsTypeAffinity(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val per = events
      .filter(col("user_id").isNotNull && col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_type")).distinct()
    // per is read four times (driver count, typeCounts, both self-join
    // sides): persist it, or the events scan + distinct recomputes per use
    graft.Caching.withCached(per) {
      val nUsers = per.select(col("user_id")).distinct().count()
      val typeCounts = per.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"))
      val pairs = per.as("a")
        .join(per.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(typeCounts.select(col("event_type").as("type_a"),
          col("n_type").as("n_a"))), Seq("type_a"))
        .join(broadcast(typeCounts.select(col("event_type").as("type_b"),
          col("n_type").as("n_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_both"),
          col("n_a"), col("n_b"),
          (col("n_both").cast("double") / lit(nUsers.toDouble)).as("support"),
          ((col("n_both").cast("double") * lit(nUsers.toDouble)) /
            (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
    }
  }

  val eventsTypeAffinitySql: String =
    """WITH per AS (
         SELECT DISTINCT user_id, event_type
         FROM events
         WHERE user_id IS NOT NULL
           AND event_type IN ('click','error','purchase','signup','view')),
       n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS users FROM per),
       tc AS (SELECT event_type, COUNT(*) AS n_type FROM per GROUP BY 1),
       pairs AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
         FROM per a
         JOIN per b ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT p.type_a, p.type_b, p.n_both, ta.n_type AS n_a, tb.n_type AS n_b,
         CAST(p.n_both AS DOUBLE) / n.users AS support,
         (CAST(p.n_both AS DOUBLE) * n.users)
           / (CAST(ta.n_type AS DOUBLE) * CAST(tb.n_type AS DOUBLE)) AS lift
       FROM pairs p
       JOIN tc ta ON ta.event_type = p.type_a
       JOIN tc tb ON tb.event_type = p.type_b
       CROSS JOIN n
       ORDER BY type_a, type_b"""

  /** Per-user behavioral diversity — Simpson's index 1 − Σp² over the
    * FIXED, enumerated type set (0 = all activity one type, → 0.8 =
    * uniform over five). Each term is a fixed expression over exact
    * integer counts and the five-term sum is written in one syntactic
    * order, so both engines run the same IEEE ops left-to-right and the
    * doubles compare bit-exactly. Shannon entropy was tried first and
    * REJECTED: `ln` is not correctly-rounded and Math.log vs DuckDB's
    * libm drift by 1 ulp on real inputs — only +,−,×,÷,sqrt are safe in
    * compared float output (SURVEY §3).
    */
  def eventsUserDiversity(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = count(lit(1)).as("total") +:
      types.map(t => count(when(col("event_type") === t, 1)).as(s"n_$t"))
    val counts = events
      .filter(col("user_id").isNotNull && col("event_type").isin(types: _*))
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
    val term = (t: String) => {
      val p = col(s"n_$t").cast("double") / col("total").cast("double")
      p * p
    }
    val outCols = Seq(col("user_id"), col("total").as("n_events")) ++
      types.map(t => col(s"n_$t")) :+
      (lit(1.0) - types.map(term).reduce(_ + _)).as("simpson_diversity")
    counts.select(outCols: _*)
  }

  val eventsUserDiversitySql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cnts = types.map(t =>
      s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t")
      .mkString(",\n         ")
    val terms = types.map(t =>
      s"""(CAST(n_$t AS DOUBLE) / CAST(n_events AS DOUBLE))
            * (CAST(n_$t AS DOUBLE) / CAST(n_events AS DOUBLE))""")
      .mkString("\n         + ")
    s"""WITH counts AS (
         SELECT user_id, COUNT(*) AS n_events,
         $cnts
         FROM events
         WHERE user_id IS NOT NULL
           AND event_type IN ('click','error','purchase','signup','view')
         GROUP BY user_id)
       SELECT user_id, n_events, n_click, n_error, n_purchase, n_signup, n_view,
         1.0 - ($terms) AS simpson_diversity
       FROM counts
       ORDER BY user_id"""
  }

  /** Repeat-purchase cadence: the distribution of day-gaps between a
    * customer's consecutive orders (lag window per customer, then a
    * global histogram of the gaps). The orderkey tiebreak makes the
    * sequence deterministic under same-day orders; the gap multiset is
    * tie-invariant anyway, so both engines agree.
    */
  def orderRepeatIntervals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(to_date(col("o_orderdate")), col("o_orderkey"))
    orders
      .withColumn("prev_date", lag(to_date(col("o_orderdate")), 1).over(w))
      .filter(col("prev_date").isNotNull)
      .select(datediff(to_date(col("o_orderdate")), col("prev_date"))
        .as("gap_days"))
      .groupBy(col("gap_days"))
      .agg(count(lit(1)).as("n_gaps"))
  }

  val orderRepeatIntervalsSql: String =
    """WITH seq AS (
         SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
         FROM orders)
       SELECT CAST(date_diff('day', prev_d, d) AS INT) AS gap_days,
         COUNT(*) AS n_gaps
       FROM seq
       WHERE prev_d IS NOT NULL
       GROUP BY 1
       ORDER BY 1"""

  /** CUBE over (status, priority): all four grouping-set combinations
    * in one pass — Catalyst expands the cube to grouping sets and the
    * partial aggregation still combines map-side, so the shuffle
    * carries one row per (set × group), not per input row.
    */
  def ordersCube(orders: DataFrame): DataFrame = orders
    .select(col("o_orderstatus").as("order_status"),
      col("o_orderpriority").as("order_priority"), col("o_totalprice"))
    .cube(col("order_status"), col("order_priority"))
    .agg(
      count(lit(1)).as("n_orders"),
      dsum(col("o_totalprice")).as("revenue"),
      grouping_id().as("grouping_level"))

  val ordersCubeSql: String =
    """SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS grouping_level
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY grouping_level, order_status, order_priority"""

  /** Mergeable-sketch rollup — the lakehouse pattern for distincts at
    * 100 TB: per-(type, day) HLL sketches are bounded partial state a
    * gold table can STORE, and any coarser rollup unions the sketches
    * instead of rescanning the raw events. The estimate itself is
    * engine-specific, so (as with [[eventsApproxUsers]]) the compared
    * output carries exact counts plus asserted bounds: the merged
    * estimate lands within 5% of the true distinct, and per-day exact
    * counts cover the total (every user is active on ≥1 day).
    */
  def eventsSketchRollup(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts_utc")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"),
        countDistinct(col("user_id")).as("daily_exact"))
    val merged = daily
      .groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"),
        sum(col("daily_exact")).as("sum_daily_exact"),
        count(lit(1)).as("n_days"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("n_days"),
        col("sum_daily_exact"),
        (col("sum_daily_exact") >= col("exact_users")).as("daily_covers_total"),
        when(col("exact_users") === 0, lit(true))
          .otherwise(abs(col("est") - col("exact_users").cast("double")) /
            col("exact_users").cast("double") <= 0.05)
          .as("merged_within_5pct"))
  }

  val eventsSketchRollupSql: String =
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS daily_exact
         FROM events
         GROUP BY 1, 2),
       totals AS (
         SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
         FROM events
         GROUP BY 1)
       SELECT d.event_type, t.exact_users,
         COUNT(*) AS n_days,
         CAST(SUM(d.daily_exact) AS BIGINT) AS sum_daily_exact,
         CAST(SUM(d.daily_exact) AS BIGINT) >= t.exact_users AS daily_covers_total,
         true AS merged_within_5pct
       FROM daily d
       JOIN totals t ON d.event_type = t.event_type
       GROUP BY d.event_type, t.exact_users
       ORDER BY d.event_type"""

  /** Hopping (sliding) window aggregation: 2-hour windows every hour,
    * so each event lands in exactly TWO overlapping windows — the
    * window shape behind moving-average dashboards and streaming
    * sliding aggs. Spark's `window(ts, "2 hours", "1 hour")` explodes
    * each row to its covering windows before the agg; fan-out is
    * len/slide (2×), then map-side combine — the shuffle carries
    * O(windows), not O(events × 2). The oracle derives the same two
    * epoch-aligned starts per event from integer hour truncation.
    */
  def eventsSlidingWindow(events: DataFrame): DataFrame = events
    .groupBy(window(col("ts_utc"), "2 hours", "1 hour").as("w"),
      col("event_type"))
    .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    .select(col("w.start").as("window_start"), col("event_type"),
      col("n_events"), col("total_value"))

  val eventsSlidingWindowSql: String =
    """WITH g AS (
         SELECT date_trunc('hour', ts) - to_hours(i) AS window_start,
           event_type, value
         FROM events, unnest([0, 1]) AS t(i))
       SELECT window_start, event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM g
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** Fixed-width value histogram (the width_bucket dashboard shape):
    * one narrow shuffle on ~10 bucket keys with map-side combine, so
    * the reduce side is O(buckets) regardless of input size. Bucket
    * assignment is per-row `floor(value / w) * w` — identical IEEE
    * expression on both engines, and the result is an exact integer
    * double, so DuckDB's round-half-even cast and Spark's truncating
    * cast agree.
    */
  def eventsHistogram(events: DataFrame, width: Int = 50): DataFrame = events
    .filter(col("value").isNotNull)
    .withColumn("bucket_lo",
      (floor(col("value") / lit(width)) * lit(width)).cast("long"))
    .groupBy(col("bucket_lo"))
    .agg(
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("bucket_value"))

  val eventsHistogramSql: String =
    """SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS bucket_value
       FROM events
       WHERE value IS NOT NULL
       GROUP BY 1
       ORDER BY 1"""

  /** Wide pivot: per-user event-type value totals as columns (explicit
    * value list ⇒ stable schema, single aggregation pass).
    */
  def eventsPivot(events: DataFrame): DataFrame = events
    .groupBy(col("user_id"))
    .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
    .agg(sum(col("value").cast("decimal(18,4)")).cast("double"))
    .na.fill(0.0)

  val eventsPivotSql: String =
    """SELECT user_id,
       COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS click,
       COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS error,
       COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS purchase,
       COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS signup,
       COALESCE(CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS view
       FROM events
       GROUP BY user_id
       ORDER BY user_id"""

  /** Wide→long melt: unpivot the per-user per-type revenue matrix back
    * to (user_id, event_type, type_value) rows via `Dataset.unpivot`
    * (Spark's melt — the inverse of [[eventsPivot]]). Zero-filled before
    * the melt, so every user emits all five types and the oracle is a
    * plain user × type expansion. One shuffle (the pivot's groupBy);
    * the melt itself is a narrow projection.
    */
  def eventsUnpivot(events: DataFrame): DataFrame =
    eventsPivot(events).unpivot(
      ids = Array(col("user_id")),
      values = Array(col("click"), col("error"), col("purchase"),
        col("signup"), col("view")),
      variableColumnName = "event_type",
      valueColumnName = "type_value")

  val eventsUnpivotSql: String =
    s"""WITH wide AS (${eventsPivotSql.replace("ORDER BY user_id", "")}),
       long AS (
         SELECT user_id, t.event_type,
           CASE t.event_type
             WHEN 'click' THEN click WHEN 'error' THEN error
             WHEN 'purchase' THEN purchase WHEN 'signup' THEN signup
             ELSE view END AS type_value
         FROM wide, (VALUES ('click'),('error'),('purchase'),('signup'),('view'))
           t(event_type))
       SELECT user_id, event_type, type_value FROM long
       ORDER BY user_id, event_type"""

  /** Top-k event values per type via the bounded-buffer typed
    * [[graft.functions.TopKAggregator]]: the shuffle carries k rows per
    * group per task regardless of group size — the scale path for
    * "top-N per key" when a full window sort of the fact table is the
    * thing to avoid. Output exploded to rows (rank, value, id) with the
    * aggregator's (value DESC, id ASC) tie-break, which the oracle
    * mirrors as a row_number window.
    */
  def eventsTopK(events: DataFrame, k: Int = 5): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val agg = new graft.functions.TopKAggregator(k).toColumn
    events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("event_type", "topk")
      .select(col("event_type"), posexplode(col("topk")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._1").as("value"), col("col._2").as("event_id"))
  }

  val eventsTopKSql: String =
    """SELECT event_type, CAST(rn AS BIGINT) AS rnk, value, event_id
       FROM (SELECT event_type, value, event_id,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY value DESC, event_id) AS rn
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL
               AND event_id IS NOT NULL)
       WHERE rn <= 5
       ORDER BY event_type, rnk"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "customer_order_presence" -> ((s, d) =>
      customerOrderPresence(Tables.customer(s, d), Tables.orders(s, d))
        .orderBy(col("presence"), col("customer_id"))),
    "order_price_quantiles" -> ((s, d) =>
      orderPriceQuantiles(Tables.orders(s, d)).orderBy(col("order_status"))),
    "events_value_ranks" -> ((s, d) =>
      eventsValueRanks(Tables.events(s, d))
        .orderBy(col("event_type"), col("rnk"), col("event_id"))),
    "cheapest_per_category" -> ((s, d) =>
      cheapestPerCategory(Tables.part(s, d))
        .orderBy(col("category"), col("product_id"))),
    "segment_set_ops" -> ((s, d) =>
      segmentSetOps(Tables.customer(s, d))
        .orderBy(col("set_op"), col("mktsegment"))),
    "revenue_rollup" -> ((s, d) =>
      revenueRollup(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))
        .orderBy(col("grouping_level"), col("region_name"), col("nation_name"))),
    "orders_cube" -> ((s, d) =>
      ordersCube(Tables.orders(s, d))
        .orderBy(col("grouping_level"), col("order_status"),
          col("order_priority"))),
    "customer_order_histogram" -> ((s, d) =>
      customerOrderHistogram(Tables.customer(s, d), Tables.orders(s, d))
        .orderBy(col("order_count"))),
    "order_repeat_intervals" -> ((s, d) =>
      orderRepeatIntervals(Tables.orders(s, d)).orderBy(col("gap_days"))),
    "supplier_late_solo" -> ((s, d) =>
      supplierLateSolo(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d)).orderBy(col("s_suppkey"))),
    "events_user_diversity" -> ((s, d) =>
      eventsUserDiversity(Tables.events(s, d)).orderBy(col("user_id"))),
    "events_type_affinity" -> ((s, d) =>
      eventsTypeAffinity(Tables.events(s, d))
        .orderBy(col("type_a"), col("type_b"))),
    "events_sketch_rollup" -> ((s, d) =>
      eventsSketchRollup(Tables.events(s, d)).orderBy(col("event_type"))),
    "events_pivot" -> ((s, d) =>
      eventsPivot(Tables.events(s, d)).orderBy(col("user_id"))),
    "events_histogram" -> ((s, d) =>
      eventsHistogram(Tables.events(s, d)).orderBy(col("bucket_lo"))),
    "events_sliding_window" -> ((s, d) =>
      eventsSlidingWindow(Tables.events(s, d))
        .orderBy(col("window_start"), col("event_type"))),
    "events_unpivot" -> ((s, d) =>
      eventsUnpivot(Tables.events(s, d))
        .orderBy(col("user_id"), col("event_type"))),
    "events_funnel" -> ((s, d) => eventsFunnel(Tables.events(s, d))),
    "events_window_funnel" -> ((s, d) =>
      eventsWindowFunnel(Tables.events(s, d))),
    "price_band_join" -> ((s, d) =>
      priceBandJoin(Tables.lineitem(s, d)).orderBy(col("band_name"))),
    "order_quantiles_sketch" -> ((s, d) =>
      priceQuantilesSketch(Tables.lineitem(s, d))
        .orderBy(col("l_returnflag"))),
    "events_approx_users" -> ((s, d) =>
      eventsApproxUsers(Tables.events(s, d)).orderBy(col("event_type"))),
    "q1_pricing_summary" -> ((s, d) =>
      q1PricingSummary(Tables.lineitem(s, d))
        .orderBy(col("return_flag"), col("line_status"))),
    "q3_top_orders" -> ((s, d) =>
      q3TopOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d)).orderBy(col("order_id"))),
    "q5_region_revenue" -> ((s, d) =>
      q5RegionRevenue(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d)).orderBy(col("region_name"), col("nation_name"))),
    "events_asof_join" -> ((s, d) =>
      eventsAsOf(Tables.events(s, d)).orderBy(col("event_id"))),
    "events_user_stats" -> ((s, d) =>
      eventsUserStats(Tables.events(s, d)).orderBy(col("user_id"))),
    "events_topk_values" -> ((s, d) =>
      eventsTopK(Tables.events(s, d)).orderBy(col("event_type"), col("rnk"))))

  def oracles: Map[String, String] = Map(
    "customer_order_presence" -> customerOrderPresenceSql,
    "order_price_quantiles" -> orderPriceQuantilesSql,
    "events_value_ranks" -> eventsValueRanksSql,
    "cheapest_per_category" -> cheapestPerCategorySql,
    "segment_set_ops" -> segmentSetOpsSql,
    "revenue_rollup" -> revenueRollupSql,
    "orders_cube" -> ordersCubeSql,
    "customer_order_histogram" -> customerOrderHistogramSql,
    "order_repeat_intervals" -> orderRepeatIntervalsSql,
    "supplier_late_solo" -> supplierLateSoloSql,
    "events_user_diversity" -> eventsUserDiversitySql,
    "events_type_affinity" -> eventsTypeAffinitySql,
    "events_sketch_rollup" -> eventsSketchRollupSql,
    "events_pivot" -> eventsPivotSql,
    "events_histogram" -> eventsHistogramSql,
    "events_sliding_window" -> eventsSlidingWindowSql,
    "events_unpivot" -> eventsUnpivotSql,
    "events_funnel" -> eventsFunnelSql,
    "events_window_funnel" -> eventsWindowFunnelSql,
    "price_band_join" -> priceBandJoinSql,
    "order_quantiles_sketch" -> priceQuantilesSketchSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders" -> q3Sql,
    "q5_region_revenue" -> q5Sql,
    "events_asof_join" -> eventsAsOfSql,
    "events_user_stats" -> eventsUserStatsSql,
    "events_topk_values" -> eventsTopKSql,
    "events_approx_users" -> eventsApproxUsersSql)
}
