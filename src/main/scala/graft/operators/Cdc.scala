package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC / slowly-changing-dimension operators.
  *
  * The reference processes change feeds with Databricks `AUTO CDC INTO …
  * KEYS … SEQUENCE BY … STORED AS SCD TYPE 1|2`
  * (ref /root/reference/src/pipelines/cdc/cdc_customers_silver.sql:55-90).
  * Spark-first re-expression: SCD resolution is a single window pass per
  * key ordered by the sequence — one shuffle on the key, no
  * driver-side state, linear at any scale. AQE handles key skew.
  *
  * The change feed here is the `events` table: key = user_id,
  * sequence = event_id (monotone), operation derived from event_type
  * (signup→INSERT, error→DELETE, else UPDATE).
  */
object Cdc {

  /** Staging: validated, normalized change feed
    * (ref cdc_customers_silver.sql:12-37 staging pattern).
    */
  def stage(events: DataFrame): DataFrame = events
    .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
      col("event_type").isNotNull && col("value").isNotNull)
    .select(
      col("event_id").as("sequence_number"),
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("operation"),
      col("user_id").as("key_id"),
      col("value"),
      col("props"))

  val stageSql: String =
    """SELECT event_id AS sequence_number,
       CASE WHEN event_type = 'signup' THEN 'INSERT'
            WHEN event_type = 'error' THEN 'DELETE'
            ELSE 'UPDATE' END AS operation,
       user_id AS key_id,
       value, props
       FROM events
       WHERE user_id IS NOT NULL AND event_id IS NOT NULL
         AND event_type IS NOT NULL AND value IS NOT NULL
       ORDER BY sequence_number"""

  /** SCD Type 1: current state per key. Latest change wins; a DELETE as
    * the latest change removes the key
    * (ref cdc_customers_silver.sql:55-66 STORED AS SCD TYPE 1).
    */
  def scd1Current(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key_id")).orderBy(col("sequence_number").desc)
    stage(events)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= "DELETE")
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
  }

  val scd1Sql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg)
       SELECT key_id, value, props, sequence_number AS last_sequence
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** SCD Type 2: full history with validity ranges. Every INSERT/UPDATE
    * opens a version; the next change of any kind closes it; DELETE only
    * closes (ref cdc_customers_silver.sql:69-90 STORED AS SCD TYPE 2;
    * generated __START_AT/__END_AT/__IS_CURRENT).
    */
  def scd2History(events: DataFrame): DataFrame =
    scd2FromStaged(stage(events))
      .filter(col("operation") =!= "DELETE")

  /** SCD2 resolution at the STAGED-change grain (key_id, operation,
    * value, props, sequence_number) — shared by the batch view above
    * and the incremental streaming apply
    * ([[graft.streaming.Scd2Apply]]), so the two cannot drift. DELETE
    * rows are RETAINED (they close the previous version and carry
    * `__end_at` bookkeeping of their own); consumers filter them.
    */
  def scd2FromStaged(staged: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key_id")).orderBy(col("sequence_number"))
    staged
      .withColumn("__end_at", lead(col("sequence_number"), 1).over(w))
      .select(
        col("key_id"), col("value"), col("props"),
        col("operation"),
        col("sequence_number").as("__start_at"),
        col("__end_at"),
        col("__end_at").isNull.as("__is_current"))
  }

  val scd2Sql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       versioned AS (
         SELECT *, lead(sequence_number, 1) OVER (PARTITION BY key_id
           ORDER BY sequence_number) AS __end_at
         FROM stg)
       SELECT key_id, value, props, operation,
         sequence_number AS __start_at, __end_at,
         __end_at IS NULL AS __is_current
       FROM versioned
       WHERE operation <> 'DELETE'
       ORDER BY key_id, __start_at"""

  // =========================================================================
  // Generic AUTO CDC (ref docs/CDC_GUIDE.md: `AUTO CDC INTO target
  // FROM stream(source) KEYS (…) SEQUENCE BY … STORED AS SCD TYPE 1|2`)
  // =========================================================================
  sealed trait ScdType
  case object ScdType1 extends ScdType
  case object ScdType2 extends ScdType

  /** Apply a validated change feed to produce the target state —
    * arbitrary key columns, sequence column, and operation column (op
    * values INSERT/UPDATE/DELETE). Handles out-of-order arrival (the
    * sequence, not arrival order, decides), delete-then-reinsert
    * (SCD2 opens a fresh version), and per-key resolution in one
    * window pass.
    */
  def applyChanges(feed: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String, scd: ScdType): DataFrame =
    applyChangesOrdered(feed, keys, Seq(col(seqCol)), opCol, scd)

  /** [[applyChanges]] with a COMPOSITE resolution order — the tie-break
    * contract for feeds whose sequence alone is not a total order per
    * key (same-key same-sequence arrivals: two writers, one coarse
    * timestamp). `orderCols.head` is the sequence (SCD2 validity
    * bounds come from it); the remaining columns break ties, applied
    * descending for SCD1 (latest wins) and ascending for SCD2
    * (versions open in resolution order). A feed with residual
    * duplicates under the FULL order is still nondeterministic — the
    * caller owns supplying a total order.
    */
  def applyChangesOrdered(feed: DataFrame, keys: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], opCol: String,
      scd: ScdType): DataFrame = {
    val keyCols = keys.map(col)
    scd match {
      case ScdType1 =>
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(orderCols.map(_.desc): _*)
        feed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1 && col(opCol) =!= "DELETE")
          .drop("__rn", opCol)
      case ScdType2 =>
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(orderCols.map(_.asc): _*)
        feed
          .withColumn("__start_at", orderCols.head)
          .withColumn("__end_at", lead(orderCols.head, 1).over(w))
          .filter(col(opCol) =!= "DELETE")
          .withColumn("__is_current", col("__end_at").isNull)
          .drop(opCol)
    }
  }

  /** Point-in-time lookup: every change event joined to the SCD2
    * version valid at its sequence, through the custom
    * [[graft.plans.PointInIntervalJoinExec]] operator (single
    * co-partitioned streaming merge — no per-key version blow-up).
    */
  def pointInTime(spark: SparkSession, events: DataFrame): DataFrame = {
    val versions = scd2History(events)
      .select(col("key_id"), col("value").as("version_value"),
        col("__start_at"), col("__end_at"))
    val points = stage(events)
      .select(col("key_id").as("p_key"), col("sequence_number"))
    graft.plans.PointInInterval.join(spark, points, versions,
        leftKey = "p_key", rightKey = "key_id", pointCol = "sequence_number",
        startCol = "__start_at", endCol = "__end_at")
      .select(col("p_key").as("key_id"), col("sequence_number"),
        col("__start_at").as("version_start"), col("version_value"))
  }

  val pointInTimeSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       versions AS (
         SELECT key_id, value AS version_value,
           sequence_number AS __start_at,
           lead(sequence_number, 1) OVER (PARTITION BY key_id
             ORDER BY sequence_number) AS __end_at
         FROM stg),
       live AS (SELECT v.* FROM versions v
         JOIN stg s ON v.key_id = s.key_id
           AND v.__start_at = s.sequence_number
         WHERE s.operation <> 'DELETE')
       SELECT p.key_id, p.sequence_number,
         v.__start_at AS version_start, v.version_value
       FROM stg p
       JOIN live v ON p.key_id = v.key_id
         AND p.sequence_number >= v.__start_at
         AND (v.__end_at IS NULL OR p.sequence_number < v.__end_at)
       ORDER BY p.key_id, p.sequence_number"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_point_in_time" -> ((s, d) =>
      pointInTime(s, Tables.events(s, d))
        .orderBy(col("key_id"), col("sequence_number"))),
    "cdc_stage" -> ((s, d) =>
      stage(Tables.events(s, d)).orderBy(col("sequence_number"))),
    "cdc_scd1_current" -> ((s, d) =>
      scd1Current(Tables.events(s, d)).orderBy(col("key_id"))),
    "cdc_scd2_history" -> ((s, d) =>
      scd2History(Tables.events(s, d)).orderBy(col("key_id"), col("__start_at"))))

  def oracles: Map[String, String] = Map(
    "cdc_point_in_time" -> pointInTimeSql,
    "cdc_stage" -> stageSql,
    "cdc_scd1_current" -> scd1Sql,
    "cdc_scd2_history" -> scd2Sql)
}
