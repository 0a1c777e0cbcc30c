package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Medallion.dsum

/** Calendar-spine gap filling with forward fill — the time-series
  * normalization every daily-reporting consumer needs over a sparse
  * activity table (a user with no events on a day must still have a
  * row carrying the last observed state, or downstream day-over-day
  * arithmetic silently skips the gap). The reference's gold dailies
  * (ref /root/reference/src/pipelines/gold/daily_orders.sql) only
  * emit observed days; this is the densified form.
  *
  * Shape: per-key daily aggregate (one shuffle), per-key day spine via
  * `sequence()` (generated DISTRIBUTED from each key's [min, max] —
  * never a driver-side calendar cross join), left join back, then two
  * `last(..., ignoreNulls)` running windows on the same (user, day)
  * sort for the filled value and the days-since-activity counter. At
  * 100 TB the spine is O(keys · span days) rows of three columns —
  * generated next to each key's data, shuffled once by the join key it
  * was generated on.
  */
object GapFill {

  /** Keep 1-in-[[UserMod]] users: the gate slice (every user at sf0.01
    * averages ~22 active days of a 30-day span, so gaps are real).
    */
  val UserMod = 7

  def gapFill(events: DataFrame): DataFrame = {
    val daily = events
      .filter(pmod(col("user_id"), lit(UserMod)) === 0)
      .groupBy(col("user_id"), to_date(col("ts_utc")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("last_active_day",
        last(when(col("n_events").isNotNull, col("day")),
          ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"), col("filled_value"),
        datediff(col("day"), col("last_active_day")).cast("long")
          .as("days_since_active"))
  }

  val gapFillSql: String =
    s"""WITH daily AS (
         SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
         FROM events WHERE user_id % $UserMod = 0
         GROUP BY 1, 2),
       bounds AS (
         SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         FROM daily GROUP BY user_id),
       spine AS (
         SELECT user_id,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
             AS day
         FROM bounds),
       joined AS (
         SELECT s.user_id, s.day, d.n_events, d.day_value
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day)
       SELECT user_id, day,
         coalesce(n_events, 0) AS n_events,
         day_value,
         last_value(day_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS filled_value,
         date_diff('day',
           last_value(CASE WHEN n_events IS NOT NULL THEN day END
             IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           day) AS days_since_active
       FROM joined
       ORDER BY user_id, day"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_gap_fill" -> ((s, d) =>
      gapFill(Tables.events(s, d)).orderBy(col("user_id"), col("day"))))

  def oracles: Map[String, String] = Map(
    "events_gap_fill" -> gapFillSql)
}
