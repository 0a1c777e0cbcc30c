package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Medallion.dsum

/** Business-insight analytics built on the medallion outputs: cohort
  * retention, RFM customer segmentation, dataset profiling, and
  * statistical anomaly flagging. These are the "gold consumer" queries a
  * lakehouse user layers on top of the reference's KPI views
  * (ref: docs/ARCHITECTURE.md gold-consumption section; the reference
  * leaves them to BI tools — here they are first-class operators).
  *
  * Determinism: every float in compared output either derives from an
  * exact decimal sum (SURVEY §3.1) or is a fixed IEEE expression over
  * such sums, evaluated in the same operation order by both engines.
  */
object Insights {

  // =========================================================================
  // Cohort retention: signup-week cohorts × weeks-since activity
  // =========================================================================
  /** Weekly cohort retention over the events stream. A user's cohort is
    * the week of their first event; each (cohort, weeks_since) cell
    * counts the distinct users active that many weeks later, with the
    * rate normalized by the week-0 cohort size.
    *
    * Scale: two shuffles — a per-user window (min over the user's rows,
    * map-side-combinable via the groupBy rewrite Catalyst applies to
    * min-over-partition) and the cohort-cell countDistinct. The final
    * window runs over O(cohorts × weeks) result rows, not events.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val staged = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        date_trunc("week", col("ts_utc")).as("activity_week"))
      .withColumn("cohort_week", min(col("activity_week")).over(byUser))
    val cells = staged
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("int").as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    cells
      .withColumn("cohort_size",
        max(when(col("weeks_since") === 0, col("active_users"))).over(byCohort))
      .select(col("cohort_week"), col("weeks_since"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention_rate"))
  }

  val cohortRetentionSql: String =
    """WITH staged AS (
         SELECT user_id, date_trunc('week', ts) AS activity_week,
           MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
         FROM events
         WHERE user_id IS NOT NULL),
       cells AS (
         SELECT cohort_week,
           CAST(date_diff('day', cohort_week, activity_week) // 7 AS INT) AS weeks_since,
           COUNT(DISTINCT user_id) AS active_users
         FROM staged
         GROUP BY 1, 2),
       sized AS (
         SELECT cohort_week, weeks_since, active_users,
           MAX(CASE WHEN weeks_since = 0 THEN active_users END)
             OVER (PARTITION BY cohort_week) AS cohort_size
         FROM cells)
       SELECT cohort_week, weeks_since, active_users, cohort_size,
         CAST(active_users AS DOUBLE) / CAST(cohort_size AS DOUBLE)
           AS retention_rate
       FROM sized
       ORDER BY cohort_week, weeks_since"""

  // =========================================================================
  // RFM segmentation: recency / frequency / monetary quartiles
  // =========================================================================
  /** Snapshot date for recency: just after the last order in the corpus
    * (orders span 1995-01-01..2001-08-01). A constant, like Q1's cutoff
    * — recency against a moving `max(date)` would make the output
    * time-dependent and force an extra global pass.
    */
  val RfmAnchor = "2001-09-01"

  /** RFM segmentation: per-customer recency/frequency/monetary rolled
    * into quartile scores (4 = best) and a coarse segment label. The
    * quartile windows order by (metric, customer_id) so ties break
    * deterministically.
    *
    * Scale note: ntile over all customers is a global sort. At 100 TB
    * the cutpoints would come from `percentile_approx` (mergeable
    * sketch, no global sort) and the scores from a broadcast range
    * lookup; exact ntile is used here for the oracle-exact contract.
    */
  /** Input-size pivot for the rank/ntile passes: below it the
    * single-partition window is cheaper than three distributed rank
    * passes (each pays a range-partition sample + shuffle + counts
    * job); above it the global window serializes customer-cardinality
    * data through one task — the r16-verdict 100 TB scale-killer. The
    * switch reads the OPTIMIZER'S file-size estimate (no job), and
    * both forms are bit-identical (DistSpec pins globalNtile ≡
    * ntile-over-global-window on per-row-unique orders — these orders
    * all tie-break on customer_id/s_suppkey), so the pivot is pure
    * cost policy, never semantics — the [[graft.operators.GraphAnn]]
    * RankDistThreshold discipline.
    */
  private val WindowBytesPivot = 512L * 1024 * 1024

  private def inputBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  def customerRfm(orders: DataFrame): DataFrame = {
    val per = orders
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(
        datediff(lit(RfmAnchor).cast("date"), max(to_date(col("o_orderdate"))))
          .cast("int").as("recency_days"),
        count(lit(1)).as("frequency"),
        dsum(col("o_totalprice")).as("monetary"))
    val scored =
      if (inputBytes(orders) > WindowBytesPivot) {
        // distributed quartiles: three global rank passes, no
        // single-partition window anywhere (guide §2; r16 verdict 6)
        val p = 32
        val s1 = graft.Dist.globalNtile(per,
          Seq(col("recency_days").desc, col("customer_id")), 4, p, "r_score")
        val s2 = graft.Dist.globalNtile(s1,
          Seq(col("frequency").asc, col("customer_id")), 4, p, "f_score")
        graft.Dist.globalNtile(s2,
          Seq(col("monetary").asc, col("customer_id")), 4, p, "m_score")
      } else {
        val r = Window.orderBy(col("recency_days").desc, col("customer_id"))
        val f = Window.orderBy(col("frequency").asc, col("customer_id"))
        val m = Window.orderBy(col("monetary").asc, col("customer_id"))
        per
          .withColumn("r_score", ntile(4).over(r))
          .withColumn("f_score", ntile(4).over(f))
          .withColumn("m_score", ntile(4).over(m))
      }
    scored
      .withColumn("segment",
        when(col("r_score") === 4 && col("f_score") === 4 &&
          col("m_score") === 4, "champion")
          .when(col("r_score") === 1, "at_risk")
          .when(col("f_score") === 4, "loyal")
          .when(col("m_score") === 4, "big_spender")
          .otherwise("regular"))
  }

  val customerRfmSql: String =
    s"""WITH per AS (
         SELECT o_custkey AS customer_id,
           CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
             DATE '$RfmAnchor') AS INT) AS recency_days,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
         FROM orders
         GROUP BY 1),
       scored AS (
         SELECT *,
           CAST(NTILE(4) OVER (ORDER BY recency_days DESC, customer_id) AS INT) AS r_score,
           CAST(NTILE(4) OVER (ORDER BY frequency ASC, customer_id) AS INT) AS f_score,
           CAST(NTILE(4) OVER (ORDER BY monetary ASC, customer_id) AS INT) AS m_score
         FROM per)
       SELECT customer_id, recency_days, frequency, monetary,
         r_score, f_score, m_score,
         CASE
           WHEN r_score = 4 AND f_score = 4 AND m_score = 4 THEN 'champion'
           WHEN r_score = 1 THEN 'at_risk'
           WHEN f_score = 4 THEN 'loyal'
           WHEN m_score = 4 THEN 'big_spender'
           ELSE 'regular'
         END AS segment
       FROM scored
       ORDER BY customer_id"""

  // =========================================================================
  // Table profiler: per-column stats in one scan
  // =========================================================================
  /** Dataset profile of the orders table: one row per column with null
    * count, exact distinct count, and min/max rendered to strings
    * (numerics via DECIMAL(18,4) so both engines format identically).
    * All metrics aggregate in a single pass (Catalyst expands the
    * multi-distinct into one multi-phase aggregate); the stack() unpivot
    * runs on the one result row.
    */
  def tableProfile(orders: DataFrame): DataFrame = {
    val agg = orders.agg(
      count(lit(1)).as("n_rows"),
      // per column: nulls, distincts, min/max as strings
      sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("nul_o_orderkey"),
      countDistinct(col("o_orderkey")).as("dst_o_orderkey"),
      min(col("o_orderkey")).cast("string").as("min_o_orderkey"),
      max(col("o_orderkey")).cast("string").as("max_o_orderkey"),
      sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("nul_o_custkey"),
      countDistinct(col("o_custkey")).as("dst_o_custkey"),
      min(col("o_custkey")).cast("string").as("min_o_custkey"),
      max(col("o_custkey")).cast("string").as("max_o_custkey"),
      sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).as("nul_o_orderstatus"),
      countDistinct(col("o_orderstatus")).as("dst_o_orderstatus"),
      min(col("o_orderstatus")).as("min_o_orderstatus"),
      max(col("o_orderstatus")).as("max_o_orderstatus"),
      sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("nul_o_totalprice"),
      countDistinct(col("o_totalprice")).as("dst_o_totalprice"),
      min(col("o_totalprice").cast(DecimalType(18, 4))).cast("string")
        .as("min_o_totalprice"),
      max(col("o_totalprice").cast(DecimalType(18, 4))).cast("string")
        .as("max_o_totalprice"),
      sum(when(col("o_orderdate").isNull, 1).otherwise(0)).as("nul_o_orderdate"),
      countDistinct(col("o_orderdate")).as("dst_o_orderdate"),
      min(to_date(col("o_orderdate"))).cast("string").as("min_o_orderdate"),
      max(to_date(col("o_orderdate"))).cast("string").as("max_o_orderdate"),
      sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).as("nul_o_orderpriority"),
      countDistinct(col("o_orderpriority")).as("dst_o_orderpriority"),
      min(col("o_orderpriority")).as("min_o_orderpriority"),
      max(col("o_orderpriority")).as("max_o_orderpriority"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val stackArgs = cols.map(c =>
      s"'$c', nul_$c, dst_$c, min_$c, max_$c").mkString(", ")
    agg.selectExpr("n_rows",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("n_rows"),
        col("n_nulls").cast("long").as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  val tableProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    def minMax(c: String): (String, String) = c match {
      case "o_totalprice" =>
        (s"CAST(MIN(CAST($c AS DECIMAL(18,4))) AS VARCHAR)",
          s"CAST(MAX(CAST($c AS DECIMAL(18,4))) AS VARCHAR)")
      case "o_orderdate" =>
        (s"CAST(MIN(CAST($c AS DATE)) AS VARCHAR)",
          s"CAST(MAX(CAST($c AS DATE)) AS VARCHAR)")
      case "o_orderkey" | "o_custkey" =>
        (s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
      case _ => (s"MIN($c)", s"MAX($c)")
    }
    val branches = cols.map { c =>
      val (mn, mx) = minMax(c)
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          COUNT(DISTINCT $c) AS n_distinct,
          $mn AS min_value, $mx AS max_value
        FROM orders"""
    }.mkString("\n       UNION ALL\n       ")
    s"""SELECT * FROM ($branches)
       ORDER BY column_name"""
  }

  // =========================================================================
  // Statistical anomaly detection: z-scores from exact decimal moments
  // =========================================================================
  /** Daily-revenue anomaly flags: population z-score of each day's
    * revenue against the whole series, from DECIMAL-exact Σx and Σx²
    * (order-independent) with the float math done once per row in a
    * fixed expression order — bitwise identical across engines.
    *
    * Scale: the groupBy reduces events to O(days) rows; the whole-frame
    * window runs over that reduced series only, so the single-partition
    * stage is bounded by the calendar, not the data.
    */
  def dailyAnomalies(orders: DataFrame, zThreshold: Double = 2.5): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
        .cast(DecimalType(18, 4)).as("rev_d"))
    val all = Window.partitionBy()  // O(days) rows by construction
    val stats = daily
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("s1", sum(col("rev_d")).over(all).cast(DecimalType(28, 4)))
      .withColumn("s2", sum((col("rev_d") * col("rev_d"))
        .cast(DecimalType(38, 8))).over(all).cast(DecimalType(38, 8)))
    val nD = col("n").cast("double")
    val s1D = col("s1").cast("double")
    val s2D = col("s2").cast("double")
    val mean = s1D / nD
    // greatest(·, 0): the cancellation form can land a few ulps below
    // zero on a near-constant series — sqrt would be NaN here and a
    // hard error in DuckDB
    val variance = greatest((s2D - s1D * s1D / nD) / nD, lit(0.0))
    stats
      .withColumn("mean_rev", mean)
      .withColumn("sd_rev", sqrt(variance))
      .withColumn("z_score",
        when(col("sd_rev") > 0,
          (col("rev_d").cast("double") - col("mean_rev")) / col("sd_rev"))
          .otherwise(lit(0.0)))
      .select(col("day"), col("rev_d").cast("double").as("revenue"),
        col("mean_rev"), col("z_score"),
        (abs(col("z_score")) > zThreshold).as("is_anomaly"))
  }

  val dailyAnomaliesSql: String =
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev_d
         FROM orders
         GROUP BY 1),
       stats AS (
         SELECT day, rev_d,
           COUNT(*) OVER () AS n,
           CAST(SUM(rev_d) OVER () AS DECIMAL(28,4)) AS s1,
           -- 19+19 = width-38 product: stays exact without tripping
           -- DuckDB's same-width multiplication overflow
           CAST(SUM(CAST(rev_d AS DECIMAL(19,4)) * CAST(rev_d AS DECIMAL(19,4)))
             OVER () AS DECIMAL(38,8)) AS s2
         FROM daily),
       scored AS (
         -- decimal→double goes via VARCHAR: DuckDB's direct conversion
         -- double-rounds wide decimals (int128→double, then descale);
         -- the string path is correctly rounded, matching Spark's
         -- BigDecimal.doubleValue
         SELECT day, rev_d,
           CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_rev,
           sqrt(greatest((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
               - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) AS sd_rev
         FROM stats)
       SELECT day, CAST(rev_d AS DOUBLE) AS revenue, mean_rev,
         CASE WHEN sd_rev > 0
           THEN (CAST(rev_d AS DOUBLE) - mean_rev) / sd_rev
           ELSE 0.0 END AS z_score,
         CASE WHEN sd_rev > 0
           THEN abs((CAST(rev_d AS DOUBLE) - mean_rev) / sd_rev) > 2.5
           ELSE false END AS is_anomaly
       FROM scored
       ORDER BY day"""

  /** Weekday seasonality of daily revenue — an additive decomposition
    * with the divisions multiplied out so every compared aggregate is
    * exact: the trend at a day is its trailing-7-OBSERVATION revenue
    * sum `s7` (decimal, exact), so `7·rev − s7` is the day's deviation
    * from trend scaled by 7 (no ÷7 anywhere); averaging that per
    * weekday gives the seasonal index (×7), with the only divisions
    * performed in DOUBLE on exact decimal sums and exact counts (§3's
    * one-exact-count-division rule). First six days are dropped (no
    * full window). O(days) rows after the first aggregate, so the
    * single-partition window is free; the one fact-scale operation is
    * the daily groupBy, map-side combinable.
    */
  def dailySeasonality(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
        .cast(DecimalType(18, 4)).as("rev_d"))
    val byDay = Window.orderBy(col("day"))
    val trail = byDay.rowsBetween(-6, 0)
    daily
      .withColumn("s7", sum(col("rev_d")).over(trail))
      .withColumn("rn", row_number().over(byDay))
      .filter(col("rn") >= 7)
      .withColumn("dev_x7", col("rev_d") * lit(7) - col("s7"))
      .groupBy(weekday(col("day")).as("wday"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("dev_x7")).cast("double") /
          count(lit(1)).cast("double")).as("seasonal_x7"),
        (sum(col("rev_d")).cast("double") /
          count(lit(1)).cast("double")).as("weekday_mean_rev"))
  }

  val dailySeasonalitySql: String =
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev_d
         FROM orders
         GROUP BY 1),
       win AS (
         SELECT day, rev_d,
           SUM(rev_d) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
           ROW_NUMBER() OVER (ORDER BY day) AS rn
         FROM daily)
       SELECT CAST(isodow(day) - 1 AS INT) AS wday,
         COUNT(*) AS n_days,
         CAST(CAST(SUM(7 * rev_d - s7) AS VARCHAR) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS seasonal_x7,
         CAST(CAST(SUM(rev_d) AS VARCHAR) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS weekday_mean_rev
       FROM win
       WHERE rn >= 7
       GROUP BY 1
       ORDER BY 1"""

  /** Closed-form OLS trend over the monthly revenue series — forecast
    * as pure sum-arithmetic: every sufficient statistic (n, Σx, Σx²,
    * Σy, Σxy, Σy²) is an EXACT integer or decimal aggregate (x is the
    * month ordinal, so Σx/Σx² are BIGINTs; y·x and y² are
    * width-checked decimal products), and slope/intercept/forecast/r
    * are computed from those exact sums in DOUBLE using only IEEE
    * exact-parity ops (+ − × ÷ sqrt) — the same discipline as
    * daily_anomalies. No iterative fitting, no transcendentals; the
    * one fact-scale pass is the monthly groupBy.
    */
  def revenueTrendOls(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
        .cast(DecimalType(18, 4)).as("y"))
    val t = monthly.withColumn("x",
      (row_number().over(Window.orderBy(col("m"))) - 1).cast("long"))
    val s = t.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).cast(DecimalType(28, 4)).as("sy"),
      sum(col("y") * col("x").cast(DecimalType(8, 0)))
        .cast(DecimalType(38, 4)).as("sxy"),
      sum((col("y").cast(DecimalType(19, 4)) *
        col("y").cast(DecimalType(19, 4))).cast(DecimalType(38, 8)))
        .cast(DecimalType(38, 8)).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val syyD = col("syy").cast("double")
    val den = nD * sxxD - sxD * sxD
    val num = nD * sxyD - sxD * syD
    val slope = when(den > 0, num / den).otherwise(lit(0.0))
    val rDen = sqrt(den * (nD * syyD - syD * syD))
    s.withColumn("slope", slope)
      .withColumn("intercept", (syD - col("slope") * sxD) / nD)
      .withColumn("forecast_next_month",
        col("intercept") + col("slope") * nD)
      .withColumn("corr_r",
        when(rDen > 0, num / rDen).otherwise(lit(0.0)))
      .select(col("n").as("n_months"), col("slope"), col("intercept"),
        col("forecast_next_month"), col("corr_r"))
  }

  val revenueTrendOlsSql: String =
    """WITH monthly AS (
         SELECT date_trunc('month', o_orderdate) AS m,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
         FROM orders
         GROUP BY 1),
       ix AS (
         SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY m) - 1 AS BIGINT) AS x
         FROM monthly),
       s AS (
         SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
           CAST(SUM(y) AS DECIMAL(28,4)) AS sy,
           CAST(SUM(y * CAST(x AS DECIMAL(8,0))) AS DECIMAL(38,4)) AS sxy,
           CAST(SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)))
             AS DECIMAL(38,8)) AS syy
         FROM ix),
       d AS (
         SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
           CAST(sxx AS DOUBLE) AS sxxd,
           CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
           CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
           CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd
         FROM s),
       fit AS (
         SELECT n, nd, sxd, syd,
           CASE WHEN nd * sxxd - sxd * sxd > 0
             THEN (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
             ELSE 0.0 END AS slope,
           nd * sxyd - sxd * syd AS num,
           (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd) AS rden2
         FROM d)
       SELECT n AS n_months, slope,
         (syd - slope * sxd) / nd AS intercept,
         (syd - slope * sxd) / nd + slope * nd AS forecast_next_month,
         CASE WHEN sqrt(rden2) > 0 THEN num / sqrt(rden2)
           ELSE 0.0 END AS corr_r
       FROM fit
       ORDER BY n_months"""

  /** Pareto / concentration analysis of supplier revenue: suppliers
    * ranked by exact-decimal revenue, cumulative share computed by
    * window sum, and the 80%-set membership decided by the
    * MULTIPLIED-OUT comparison `5·cum ≤ 4·total` — integer×decimal,
    * no division in the predicate, so both engines agree exactly even
    * at the boundary supplier. Shares emitted as double only for
    * display (exact-sum ÷ exact-sum). O(suppliers) window rows after
    * one fact-scale aggregate.
    */
  def supplierPareto(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("revenue"))
    val joined = rev
      .join(supplier.select(col("s_suppkey"), col("s_name")), Seq("s_suppkey"))
    val order = Seq(col("revenue").desc, col("s_suppkey"))
    val ranked =
      if (inputBytes(lineitem) > WindowBytesPivot) {
        // distributed rank + running sum: range partition on the rank
        // order, per-partition prefix sums + driver offsets — no
        // single-partition window over supplier-cardinality data
        // (guide §2; r16 verdict 6). Decimal-exact; bit-identical to
        // the window form (DistSpec).
        graft.Dist.globalRunningSum(joined, order, col("revenue"), 32,
            "_rnk_l", "cum", "total")
          .withColumn("rnk", col("_rnk_l").cast("int")).drop("_rnk_l")
      } else {
        val byRev = Window.orderBy(order: _*)
        val all = Window.partitionBy()
        joined
          .withColumn("rnk", row_number().over(byRev))
          .withColumn("cum", sum(col("revenue")).over(
            byRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("total", sum(col("revenue")).over(all))
      }
    ranked
      .withColumn("in_top80",
        col("cum") * lit(5) <= col("total") * lit(4))
      .select(col("rnk"), col("s_suppkey"), col("s_name"),
        col("revenue").cast("double").as("revenue"),
        (col("cum").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        col("in_top80"))
  }

  val supplierParetoSql: String =
    """WITH rev AS (
         SELECT l_suppkey AS s_suppkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue
         FROM lineitem
         GROUP BY 1),
       ranked AS (
         SELECT r.s_suppkey, s.s_name, r.revenue,
           ROW_NUMBER() OVER (ORDER BY r.revenue DESC, r.s_suppkey) AS rnk,
           SUM(r.revenue) OVER (ORDER BY r.revenue DESC, r.s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(r.revenue) OVER () AS total
         FROM rev r JOIN supplier s USING (s_suppkey))
       SELECT CAST(rnk AS INT) AS rnk, s_suppkey, s_name,
         CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
         CAST(CAST(cum AS VARCHAR) AS DOUBLE)
           / CAST(CAST(total AS VARCHAR) AS DOUBLE) AS cum_share,
         cum * 5 <= total * 4 AS in_top80
       FROM ranked
       ORDER BY rnk"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "supplier_pareto" -> ((s, d) =>
      supplierPareto(Tables.lineitem(s, d), Tables.supplier(s, d))
        .orderBy(col("rnk"))),
    "revenue_trend_ols" -> ((s, d) =>
      revenueTrendOls(Tables.orders(s, d)).orderBy(col("n_months"))),
    "daily_seasonality" -> ((s, d) =>
      dailySeasonality(Tables.orders(s, d)).orderBy(col("wday"))),
    "cohort_retention" -> ((s, d) =>
      cohortRetention(Tables.events(s, d))
        .orderBy(col("cohort_week"), col("weeks_since"))),
    "customer_rfm" -> ((s, d) =>
      customerRfm(Tables.orders(s, d)).orderBy(col("customer_id"))),
    "table_profile" -> ((s, d) =>
      tableProfile(Tables.orders(s, d)).orderBy(col("column_name"))),
    "daily_anomalies" -> ((s, d) =>
      dailyAnomalies(Tables.orders(s, d)).orderBy(col("day"))))

  def oracles: Map[String, String] = Map(
    "supplier_pareto" -> supplierParetoSql,
    "revenue_trend_ols" -> revenueTrendOlsSql,
    "daily_seasonality" -> dailySeasonalitySql,
    "cohort_retention" -> cohortRetentionSql,
    "customer_rfm" -> customerRfmSql,
    "table_profile" -> tableProfileSql,
    "daily_anomalies" -> dailyAnomaliesSql)
}
