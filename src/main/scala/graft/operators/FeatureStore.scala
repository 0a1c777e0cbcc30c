package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Point-in-time training-set extraction — the feature-store contract
  * behind every supervised pipeline on event data: for each label
  * event, every feature must be computed from STRICTLY PRIOR history
  * (rows before the label in (ts, id) order), or the model trains on
  * leaked future. Spark-first shape: the features are running windows
  * over the per-user timeline with an EXCLUSIVE upper frame bound
  * (`ROWS ... AND 1 PRECEDING` — the label row itself never feeds its
  * own features), then the timeline filters down to the label rows.
  * ONE shuffle on user_id serves every feature; no per-feature join,
  * no range join, no label×history blow-up — at 100 TB this is one
  * sorted pass per user partition regardless of how many features
  * ride along.
  *
  * Determinism: timeline order is the total (ts_us, event_id); the
  * running spend folds DECIMAL(18,4) (order-independent, §3.1) and
  * pins the empty-history case to 0 explicitly on both sides (the
  * txn-gate lesson: never rely on engine null conventions agreeing);
  * counts are BIGINTs; the gap is integer micros.
  */
object FeatureStore {

  /** Label events: purchases; the target is the purchase value. */
  val LabelType = "purchase"

  def trainingSet(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val prior = order.rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("f_n_prior", count(lit(1)).over(prior))
      .withColumn("f_spend_prior", coalesce(
        sum(col("value").cast("decimal(18,4)")).over(prior)
          .cast("double"), lit(0.0)))
      .withColumn("f_last_type", lag(col("event_type"), 1).over(order))
      .withColumn("f_gap_us", col("ts_us") - lag(col("ts_us"), 1).over(order))
      .filter(col("event_type") === LabelType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("f_n_prior"), col("f_spend_prior"), col("f_last_type"),
        col("f_gap_us"), col("value").as("target"))
  }

  val trainingSetSql: String =
    s"""WITH timeline AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
           value,
           CAST(COUNT(*) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS BIGINT) AS f_n_prior,
           COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS DOUBLE), 0.0) AS f_spend_prior,
           lag(event_type, 1) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS f_last_type,
           epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS f_gap_us
         FROM events)
       SELECT event_id, user_id, ts_us, f_n_prior, f_spend_prior,
         f_last_type, f_gap_us, value AS target
       FROM timeline
       WHERE event_type = '$LabelType'
       ORDER BY event_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map(
    "events_training_set" -> ((s, d) =>
      trainingSet(Tables.events(s, d)).orderBy(col("event_id"))))

  def oracles: Map[String, String] = Map(
    "events_training_set" -> trainingSetSql)
}
