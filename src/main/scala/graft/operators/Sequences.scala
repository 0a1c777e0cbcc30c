package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence analytics over per-user ordered streams — the two
  * shapes the funnel/path family hasn't covered:
  *
  *  - `events_transition_matrix`: the first-order Markov chain of
  *    event types (P(next = b | current = a) from exact transition
  *    counts) — the behavioral fingerprint dashboards diff across
  *    releases, and the generative model behind session simulation.
  *  - `events_attribution`: position-based multi-touch attribution
  *    (the 40/20/40 "U-shape" marketers run): each purchase distributes
  *    credit over the clicks/views that preceded it within the lookback
  *    window — first and last touch get the anchors' share, middles
  *    split the rest. Credit is INTEGER MICRO-UNITS (÷ by `div`), so
  *    per-channel totals are exact BIGINTs — no float summation, no
  *    cross-engine drift, and remainders are dropped identically on
  *    both engines (documented: a journey's credits may sum to less
  *    than 1e6 by up to k−2 units).
  *
  * Scale posture: both shapes shuffle once by user (window sort) or by
  * (user) for the purchase⋈touch interval join, then aggregate to a
  * tiny (types × types / channels) result. Nothing is ever collected;
  * the transition matrix is ≤ |types|² rows, attribution ≤ |channels|.
  */
object Sequences {

  /** (from_type, to_type, n_trans, n_from, p) over consecutive events
    * per user, ordered by (ts_us, event_id) — the tiebreak makes the
    * sequence, and therefore the matrix, deterministic.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val steps = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTotals = Window.partitionBy(col("from_type"))
    counts
      .withColumn("n_from", sum(col("n_trans")).over(fromTotals))
      .withColumn("p",
        col("n_trans").cast("double") / col("n_from").cast("double"))
  }

  val transitionMatrixSql: String =
    """WITH steps AS (
         SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS to_type
         FROM events WHERE user_id IS NOT NULL),
       counts AS (
         SELECT from_type, to_type, COUNT(*) AS n_trans
         FROM steps WHERE to_type IS NOT NULL
         GROUP BY 1, 2)
       SELECT from_type, to_type, n_trans,
         CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
         CAST(n_trans AS DOUBLE) /
           CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS p
       FROM counts
       ORDER BY 1, 2"""

  /** Lookback window and micro-credit scale for [[attribution]]. */
  val LookbackUs = 7L * 24 * 3600 * 1000000 // 7 days in micros
  val CreditUnits = 1000000L

  /** U-shape credit of one touch at `pos` (1-based) of a `k`-touch
    * journey, in micro-units: k=1 → all; k=2 → half/half; k≥3 →
    * 40% anchors, middles split 20% by integer `div` (both engines
    * floor identically; ≤ k−2 units of remainder vanish per journey).
    */
  private def creditCol: org.apache.spark.sql.Column =
    when(col("k") === 1, lit(CreditUnits))
      .when(col("k") === 2, lit(CreditUnits / 2))
      .when(col("pos") === 1 || col("pos") === col("k"),
        lit(CreditUnits * 2 / 5))
      .otherwise(expr(s"(${CreditUnits / 5}L) div (k - 2)"))

  /** Per-channel attribution totals: each purchase's preceding
    * clicks/views inside the lookback get U-shape micro-credits;
    * output (channel, n_touches, n_journeys, credit_units).
    */
  def attribution(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val touches = events
      .filter(col("event_type").isin("click", "view") &&
        col("user_id").isNotNull)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts_us").as("t_ts"))
    val journeys = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - lit(LookbackUs))
    val wj = Window.partitionBy(col("purchase_id"))
    val ranked = journeys
      .withColumn("pos", row_number().over(
        wj.orderBy(col("t_ts"), col("touch_id"))))
      .withColumn("k", count(lit(1)).over(wj))
    ranked.withColumn("credit", creditCol)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_journeys"),
        sum(col("credit")).as("credit_units"))
  }

  val attributionSql: String =
    s"""WITH purchases AS (
         SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts
         FROM events
         WHERE event_type = 'purchase' AND user_id IS NOT NULL),
       touches AS (
         SELECT user_id, event_id AS touch_id, event_type AS channel,
           epoch_us(ts) AS t_ts
         FROM events
         WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL),
       journeys AS (
         SELECT p.purchase_id, t.touch_id, t.channel, t.t_ts
         FROM purchases p JOIN touches t ON p.user_id = t.user_id
         WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - $LookbackUs),
       ranked AS (
         SELECT purchase_id, channel,
           row_number() OVER (PARTITION BY purchase_id
             ORDER BY t_ts, touch_id) AS pos,
           COUNT(*) OVER (PARTITION BY purchase_id) AS k
         FROM journeys),
       credited AS (
         SELECT channel, purchase_id,
           CASE WHEN k = 1 THEN ${CreditUnits}
                WHEN k = 2 THEN ${CreditUnits / 2}
                WHEN pos = 1 OR pos = k THEN ${CreditUnits * 2 / 5}
                ELSE ${CreditUnits / 5} // (k - 2) END AS credit
         FROM ranked)
       SELECT channel, COUNT(*) AS n_touches,
         CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_journeys,
         CAST(SUM(credit) AS BIGINT) AS credit_units
       FROM credited
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_transition_matrix" -> ((s, d) =>
      transitionMatrix(Tables.events(s, d))
        .orderBy(col("from_type"), col("to_type"))),
    "events_attribution" -> ((s, d) =>
      attribution(Tables.events(s, d)).orderBy(col("channel"))))

  def oracles: Map[String, String] = Map(
    "events_transition_matrix" -> transitionMatrixSql,
    "events_attribution" -> attributionSql)
}
