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
      // floor division (not `div`, which truncates toward zero): the
      // DuckDB mirror's `//` floors, and the two differ on negative keys
      .groupBy(col("event_type"),
        floor(col("k") / lit(10.0)).cast("int").as("k_decile"))
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

  // =========================================================================
  // events_hll_intersection — sketch algebra by inclusion–exclusion
  // =========================================================================
  /** HLL sketches union natively but cannot intersect; the standard
    * workaround is inclusion–exclusion: |A∩B| ≈ |A|+|B|−|A∪B|, each
    * term an HLL estimate. This computes the click∩purchase audience
    * that way and ASSERTS the compounded error against the exact
    * intersection (the [[Analytics.eventsApproxUsers]] bound-oracle
    * pattern — the estimate itself is engine-specific, its contract is
    * exactly checkable). Everything derives from ONE per-user
    * conditional-flag aggregate, so the input shuffles once.
    */
  def eventsHllIntersection(events: DataFrame): DataFrame = {
    val perUser = events
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("has_click"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("has_buy"))
    perUser.agg(
      sum(col("has_click")).as("exact_click"),
      sum(col("has_buy")).as("exact_buy"),
      sum(col("has_click") * col("has_buy")).as("exact_both"),
      approx_count_distinct(
        when(col("has_click") === 1L, col("user_id")), rsd = 0.02)
        .as("hll_click"),
      approx_count_distinct(
        when(col("has_buy") === 1L, col("user_id")), rsd = 0.02)
        .as("hll_buy"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("hll_union"))
      .select(col("exact_click"), col("exact_buy"), col("exact_both"),
        // three 2%-rsd estimates compound; 15% relative slack is ample
        when(col("exact_both") === 0, lit(true))
          .otherwise(
            abs(col("hll_click") + col("hll_buy") - col("hll_union")
              - col("exact_both")).cast("double") /
              col("exact_both").cast("double") <= 0.15)
          .as("inter_within_15pct"))
  }

  val eventsHllIntersectionSql: String =
    """SELECT CAST(SUM(has_click) AS BIGINT) AS exact_click,
       CAST(SUM(has_buy) AS BIGINT) AS exact_buy,
       CAST(SUM(has_click * has_buy) AS BIGINT) AS exact_both,
       true AS inter_within_15pct
       FROM (SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_buy
             FROM events
             WHERE user_id IS NOT NULL
               AND event_type IN ('click', 'purchase')
             GROUP BY 1)"""

  // =========================================================================
  // events_variant_stats — the VARIANT semi-structured type
  // =========================================================================
  /** The open VARIANT path through the same payload
    * [[eventsJsonBreakdown]] parses with a CLOSED struct schema:
    * `try_parse_json` → binary variant, `variant_get` with a type —
    * the Spark 4 story for schema-on-read columns where fields are
    * discovered per query, kept binary (not re-serialized text)
    * between. Malformed payloads null out via the try_ variant, and
    * the counts make the parse success rate part of the verified
    * output.
    */
  def eventsVariantStats(events: DataFrame): DataFrame = events
    .withColumn("v", expr("try_parse_json(props)"))
    .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
    .groupBy(col("event_type"))
    .agg(count(lit(1)).as("n_events"),
      count(col("v")).as("n_parsed"),
      count(col("k")).as("n_with_k"),
      min(col("k")).as("min_k"),
      max(col("k")).as("max_k"),
      sum(col("k")).as("sum_k"))

  val eventsVariantStatsSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
       COUNT(CASE WHEN json_valid(props) THEN 1 END) AS n_parsed,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
       FROM events
       GROUP BY 1 ORDER BY 1"""

  // =========================================================================
  // events_session_window — declarative session windows (batch form)
  // =========================================================================
  /** `session_window(ts, gap)` — the DECLARATIVE session operator (the
    * same grouping Structured Streaming merges incrementally with
    * state) — against which [[graft.streaming.EventStreams
    * .sessionizeBatch]]'s manual gaps-and-islands is the imperative
    * twin. Output stays in the exact microsecond domain: window bounds
    * convert via `unix_micros`, never float seconds.
    */
  def eventsSessionWindow(events: DataFrame): DataFrame = events
    .filter(col("user_id").isNotNull)
    .groupBy(col("user_id"),
      session_window(col("ts_utc"), "30 minutes").as("w"))
    .agg(count(lit(1)).as("n_events"),
      dsum(col("value")).as("session_value"))
    .select(col("user_id"),
      unix_micros(col("w.start")).as("start_us"),
      unix_micros(col("w.end")).as("end_us"),
      col("n_events"), col("session_value"))

  /** Oracle: gaps-and-islands. session_window's end = last event +
    * gap, by definition.
    */
  val eventsSessionWindowSql: String =
    """WITH flagged AS (
         SELECT user_id, value, epoch_us(ts) AS tsu,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                THEN 1 ELSE 0 END AS new_session
         FROM events WHERE user_id IS NOT NULL
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
       sessions AS (
         SELECT *, SUM(new_session) OVER (PARTITION BY user_id
           ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS session_idx
         FROM flagged)
       SELECT user_id, MIN(tsu) AS start_us,
         MAX(tsu) + 1800000000 AS end_us,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
       FROM sessions
       GROUP BY user_id, session_idx
       ORDER BY user_id, start_us"""

  // =========================================================================
  // orders_grouping_sets — custom grouping sets (neither rollup nor cube)
  // =========================================================================
  /** Explicit GROUPING SETS ((status), (priority), ()) — two
    * independent one-dimension rollups plus the grand total in ONE
    * pass, a set combination neither `rollup` nor `cube` expresses
    * (cube would add the unwanted (status, priority) cell).
    * `grouping_id` disambiguates a real NULL group key from a
    * superaggregate row. Planned as a single Expand + aggregation —
    * one shuffle regardless of set count.
    */
  def ordersGroupingSets(orders: DataFrame): DataFrame = orders
    .groupingSets(
      Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
      col("o_orderstatus"), col("o_orderpriority"))
    .agg(grouping_id().as("gid"),
      count(lit(1)).as("n_orders"),
      dsum(col("o_totalprice")).as("total_price"))
    .select(col("o_orderstatus").as("order_status"),
      col("o_orderpriority").as("order_priority"),
      col("gid"), col("n_orders"), col("total_price"))

  val ordersGroupingSetsSql: String =
    """SELECT o_orderstatus AS order_status,
       o_orderpriority AS order_priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY gid, order_status, order_priority"""

  // =========================================================================
  // events_cms_topk — count-min sketch frequency estimation
  // =========================================================================
  /** The third sketch family beside HLL (distinct) and Greenwald-Khanna
    * (quantiles): count-min for FREQUENCY. The sketch builds with the
    * built-in mergeable `count_min_sketch` aggregate — bounded memory
    * per partial, one reduce — and only the 10 probe answers cross to
    * the driver (model state, the [[Ivf]] centroid discipline; the
    * probe uses Spark's own CountMinSketch deserializer). Two CMS
    * contracts are asserted in-gate per key: never-underestimate
    * (structural) and overestimate ≤ ε·N (holds w.p. ≥ the configured
    * confidence; at this ε the slack is ~0.1% of N).
    *
    * Events is read exactly twice: the exact top-10 groupBy, and ONE
    * combined aggregate producing both the sketch and N (a separate
    * count() was a third full scan for one long).
    */
  def eventsCmsTopk(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val eps = 0.001
    val conf = 0.99
    val keyed = events.filter(col("user_id").isNotNull)
    val exact = keyed.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val skRow = keyed
      .agg(count_min_sketch(col("user_id"), lit(eps), lit(conf), lit(42))
        .as("sk"), count(lit(1)).as("n"))
      .head()
    val total = skRow.getLong(1)
    val sketchBytes = skRow.getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val slack = (eps * total).ceil.toLong
    exact.toSeq.map { case (uid, ex) =>
      val est = sketch.estimateCount(uid)
      (uid, ex, est >= ex, est <= ex + slack)
    }.toDF("user_id", "exact_n", "never_under", "within_eps_n")
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  val eventsCmsTopkSql: String =
    """SELECT user_id, exact_n, true AS never_under, true AS within_eps_n
       FROM (SELECT user_id, COUNT(*) AS exact_n
             FROM events WHERE user_id IS NOT NULL
             GROUP BY 1
             ORDER BY exact_n DESC, user_id LIMIT 10)
       ORDER BY exact_n DESC, user_id"""

  /** A/B experiment readout — deterministic hash-bucket assignment
    * (`user_id % 2`, the id-sharding every experimentation platform
    * uses) and a high-value-purchase conversion comparison (purchase with
    * value > 100 — the plain purchase rate saturates at 1.0 in the
    * synthetic feed, degenerating the pooled variance) computed from
    * EXACT counts: per-variant users / converters / conversion rates,
    * relative lift, and the two-proportion z-statistic from the pooled
    * rate — every float is `+ − × ÷ sqrt` over exact integers, so the
    * statistic is bit-reproducible cross-engine (no erf; the CONSUMER
    * maps z to significance). One user-grain aggregate then a 2-row
    * reduce.
    */
  def eventsAbTest(events: DataFrame): DataFrame = {
    val perUser = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" && col("value") > 100)
        .cast("int")).as("converted"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    val agg = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).cast("long").as("n_converted"))
    val a = agg.filter(col("variant") === "A")
      .select(col("n_users").as("n_a"), col("n_converted").as("c_a"))
    val b = agg.filter(col("variant") === "B")
      .select(col("n_users").as("n_b"), col("n_converted").as("c_b"))
    // two 1-row frames: the crossJoin is a broadcast scalar combine
    a.crossJoin(b).select(
      col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      (col("c_a").cast("double") / col("n_a").cast("double")).as("conv_a"),
      (col("c_b").cast("double") / col("n_b").cast("double")).as("conv_b"),
      ((col("c_b").cast("double") / col("n_b").cast("double")) /
        (col("c_a").cast("double") / col("n_a").cast("double")) - 1.0)
        .as("rel_lift"),
      (((col("c_b").cast("double") / col("n_b").cast("double")) -
        (col("c_a").cast("double") / col("n_a").cast("double"))) /
        sqrt(((col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")) *
          (lit(1.0) - (col("c_a") + col("c_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double")) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double")))).as("z_stat"))
  }

  val eventsAbTestSql: String =
    """WITH u AS (
         SELECT user_id,
           MAX(CASE WHEN event_type = 'purchase' AND value > 100
             THEN 1 ELSE 0 END) AS converted,
           CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
         FROM events WHERE user_id IS NOT NULL
         GROUP BY user_id),
       v AS (
         SELECT variant, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS c
         FROM u GROUP BY variant),
       j AS (
         SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
         FROM (SELECT * FROM v WHERE variant = 'A') a,
              (SELECT * FROM v WHERE variant = 'B') b)
       SELECT n_a, c_a, n_b, c_b,
         CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS conv_a,
         CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS conv_b,
         (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - 1.0 AS rel_lift,
         ((CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           - (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
           / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           AS z_stat
       FROM j"""

  /** DAU / WAU / MAU — per-day EXACT rolling distinct users (1 / 7 /
    * 28-day trailing windows), the canonical engagement report.
    * Distinct-over-a-sliding-window does not decompose into partial
    * aggregates, so the scalable exact shape is: dedupe to (day, user)
    * pairs once (one shuffle, map-side combinable), then EXPLODE each
    * pair to the ≤win report days it covers (an activity on day d is
    * visible in windows ending d .. d+win-1) and run a second keyed
    * distinct aggregate on (report_day) — a bounded ≤28× fan-out with
    * NO join against the day spine (a range-condition join would plan
    * as BroadcastNestedLoopJoin, O(pairs × days) predicate
    * evaluations — the classic range-join trap at scale). DAU is just
    * the pair count per day (pairs are already distinct). The final
    * inner joins on `day` are O(days) rows a side — broadcast-sized —
    * and simultaneously prune exploded report days that fall outside
    * the observed day spine (a day with zero activity has no DAU row).
    * Nothing is ever quadratic in users or days; the approximate path
    * for wider windows is the HLL partial-merge of
    * `events_sketch_rollup`.
    */
  def eventsDauWauMau(events: DataFrame): DataFrame = {
    val dayUser = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_utc").cast("date").as("day"))
      .distinct() // one (day, user) pair per active day
      .localCheckpoint(true) // read by all three window aggregates
    // pairs are distinct, so per-day distinct users = per-day pair count
    val dau = dayUser.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    def rolling(win: Int, name: String): DataFrame =
      dayUser
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), win - 1)))
            .as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as(name))
    dau
      .join(rolling(7, "wau"), Seq("day"))
      .join(rolling(28, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"))
  }

  val eventsDauWauMauSql: String =
    """WITH du AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         FROM events WHERE user_id IS NOT NULL),
       days AS (SELECT DISTINCT day FROM du),
       dau AS (
         SELECT d.day, COUNT(DISTINCT u.user_id) AS dau
         FROM days d JOIN du u ON u.day = d.day
         GROUP BY d.day),
       wau AS (
         SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
         FROM days d JOIN du u
           ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
         GROUP BY d.day),
       mau AS (
         SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
         FROM days d JOIN du u
           ON u.day <= d.day AND u.day >= d.day - INTERVAL 27 DAY
         GROUP BY d.day)
       SELECT day, dau, wau, mau
       FROM dau JOIN wau USING (day) JOIN mau USING (day)
       ORDER BY day"""

  /** BURST / BOT detection — the rate-based abuse heuristic every
    * event pipeline runs before trusting engagement metrics: per user,
    * events per MINUTE bucket (exact integer bucketing of the
    * microsecond domain), the peak burst, and an integer-threshold
    * flag. Two keyed aggregates, both map-side combinable — (user,
    * minute) then user — so the per-user state is O(active minutes),
    * never a sorted event sequence.
    */
  def eventsBotDetection(events: DataFrame,
      burstThreshold: Int = 5): DataFrame = {
    val perMinute = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"),
        // integral `div`, not `/`: Column `/` is double division, and
        // the bucket must be pure integer arithmetic (ts_us > 0, so
        // truncating div == DuckDB's flooring `//`)
        expr("ts_us div 60000000").as("minute_bucket"))
      .agg(count(lit(1)).as("n_in_minute"))
    perMinute.groupBy(col("user_id"))
      .agg(sum(col("n_in_minute")).cast("long").as("n_events"),
        count(lit(1)).as("n_active_minutes"),
        max(col("n_in_minute")).as("max_per_minute"))
      .withColumn("burst_flag",
        col("max_per_minute") >= burstThreshold)
  }

  val eventsBotDetectionSql: String =
    """WITH m AS (
         SELECT user_id, epoch_us(ts) // 60000000 AS minute_bucket,
           COUNT(*) AS n_in_minute
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1, 2)
       SELECT user_id, CAST(SUM(n_in_minute) AS BIGINT) AS n_events,
         COUNT(*) AS n_active_minutes,
         MAX(n_in_minute) AS max_per_minute,
         MAX(n_in_minute) >= 5 AS burst_flag
       FROM m
       GROUP BY user_id
       ORDER BY user_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_bot_detection" -> ((s, d) =>
      eventsBotDetection(Tables.events(s, d)).orderBy(col("user_id"))),
    "events_dau_wau_mau" -> ((s, d) =>
      eventsDauWauMau(Tables.events(s, d)).orderBy(col("day"))),
    "events_ab_test" -> ((s, d) => eventsAbTest(Tables.events(s, d))),
    "events_json_breakdown" -> ((s, d) =>
      eventsJsonBreakdown(Tables.events(s, d))
        .orderBy(col("event_type"), col("k_decile"))),
    "customer_trailing_spend" -> ((s, d) =>
      customerTrailingSpend(Tables.orders(s, d))
        .orderBy(col("customer_id"), col("order_id"))),
    "lineitem_price_qty_corr" -> ((s, d) =>
      lineitemPriceQtyCorr(Tables.lineitem(s, d))
        .orderBy(col("return_flag"))),
    "events_hll_intersection" -> ((s, d) =>
      eventsHllIntersection(Tables.events(s, d))),
    "events_variant_stats" -> ((s, d) =>
      eventsVariantStats(Tables.events(s, d)).orderBy(col("event_type"))),
    "events_session_window" -> ((s, d) =>
      eventsSessionWindow(Tables.events(s, d))
        .orderBy(col("user_id"), col("start_us"))),
    "orders_grouping_sets" -> ((s, d) =>
      ordersGroupingSets(Tables.orders(s, d))
        .orderBy(col("gid"), col("order_status"), col("order_priority"))),
    "events_cms_topk" -> ((s, d) =>
      eventsCmsTopk(Tables.events(s, d))))

  def oracles: Map[String, String] = Map(
    "events_bot_detection" -> eventsBotDetectionSql,
    "events_dau_wau_mau" -> eventsDauWauMauSql,
    "events_ab_test" -> eventsAbTestSql,
    "events_json_breakdown" -> eventsJsonBreakdownSql,
    "customer_trailing_spend" -> customerTrailingSpendSql,
    "lineitem_price_qty_corr" -> lineitemPriceQtyCorrSql,
    "events_hll_intersection" -> eventsHllIntersectionSql,
    "events_variant_stats" -> eventsVariantStatsSql,
    "events_session_window" -> eventsSessionWindowSql,
    "orders_grouping_sets" -> ordersGroupingSetsSql,
    "events_cms_topk" -> eventsCmsTopkSql)
}
