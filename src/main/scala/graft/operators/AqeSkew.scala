package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** AQE skew-join demonstration — the BUILT-IN complement of the manual
  * salting paths in [[Skew]]: Spark's adaptive execution detects a
  * skewed shuffle partition at RUNTIME (from the map-stage statistics)
  * and splits it into sub-partitions, replicating the matching build
  * rows — exactly what [[Skew.saltedJoin]] does by hand, but decided
  * from observed sizes instead of a guessed salt factor. At 100 TB the
  * production posture is: AQE skew handling ON as the first line of
  * defense, manual salting reserved for the aggregations AQE cannot
  * re-plan ([[Skew.saltedAgg]]) and for joins whose skew survives
  * AQE's threshold heuristics.
  *
  * The fixture makes the skew real: the fact's join key collapses
  * three of every four events onto key 0, the dim
  * side carries one row per key, and the join is hinted MERGE with a
  * low skew threshold so the optimizer's skew split provably fires on
  * local data sizes (the spec asserts `isSkewJoin`/`skew=true` in the
  * executed plan). The result is a plain per-key rollup — AQE
  * re-planning must be invisible in it, so the oracle is the plain
  * join.
  */
object AqeSkew {

  /** Collapse three of every four events onto key 0: ~75% of rows
    * share one join key while the remaining event ids spread across
    * every shuffle partition — the hot partition must dwarf the MEDIAN
    * NON-EMPTY partition (Spark's skew test ignores empty partitions,
    * and the median is taken over partitions that have data: the cold
    * keys must both be numerous and spread, or the hot partition ends
    * up being its own median and is, by that definition, not skewed).
    */
  private def skewKey(c: org.apache.spark.sql.Column) =
    when(pmod(c, lit(4)) =!= 0, lit(0L)).otherwise(c)

  /** Scope the AQE skew confs to `body` (saved/restored): thresholds
    * tuned so the split triggers at test scale; at production scale
    * the defaults (256 MB) do the same job.
    */
  private[graft] def withSkewConfs[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      // the dim must not broadcast or there is no shuffle join to split
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** The skewed fact⋈dim rollup (plan only — evaluate inside
    * [[withSkewConfs]] for the skew split to fire). The aggregation is
    * on event_type, NOT the join key: a downstream operator that
    * reuses the join's hash partitioning would make the skew split
    * introduce an extra shuffle, and AQE then (correctly) declines to
    * split — the demonstration needs a consumer with no distribution
    * requirement on the join key, which is also the common production
    * shape (enrich by key, roll up by something else).
    */
  private[graft] def skewedRollup(events: DataFrame): DataFrame = {
    // AQE splits a skewed reduce partition at MAP-OUTPUT granularity: a
    // one-file local fixture has one map task, whose single block can
    // never be subdivided. Force map-side parallelism the way a real
    // table's thousands of input splits provide it for free.
    val fact = events.repartition(16)
      .select(skewKey(col("event_id")).as("k"),
        col("value"), col("event_type"))
    // materialize the dim: OptimizeSkewedJoin only matches a join whose
    // children are Sort ← ShuffleStage; an un-materialized distinct()
    // leaves its final HashAggregate between the two and the rule
    // (correctly, conservatively) declines. A real dim TABLE reads from
    // storage and has the clean shape; localCheckpoint is the local
    // fixture's stand-in for that.
    val dim = events.select(skewKey(col("event_id")).as("k")).distinct()
      .withColumn("k_label",
        concat(lit("key_"), col("k").cast("string")))
      .localCheckpoint()
    fact.hint("merge").join(dim, "k")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("k_label")).as("n_keys"),
        Medallion.dsum(col("value")).as("total_value"))
  }

  def aqeSkewJoin(spark: SparkSession, events: DataFrame): DataFrame =
    withSkewConfs(spark) {
      // force evaluation within the conf scope so AQE re-plans here
      skewedRollup(events).localCheckpoint()
    }

  val aqeSkewJoinSql: String =
    s"""WITH fact AS (
         SELECT CASE WHEN event_id % 4 <> 0 THEN 0 ELSE event_id END AS k,
           value, event_type
         FROM events),
       dim AS (SELECT DISTINCT k, 'key_' || CAST(k AS VARCHAR) AS k_label
               FROM fact)
       SELECT f.event_type,
         COUNT(*) AS n_events,
         COUNT(DISTINCT d.k_label) AS n_keys,
         CAST(SUM(CAST(f.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM fact f JOIN dim d ON f.k = d.k
       GROUP BY 1
       ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_aqe_skew_join" -> ((s, d) =>
      aqeSkewJoin(s, Tables.events(s, d)).orderBy(col("event_type"))))

  def oracles: Map[String, String] = Map(
    "events_aqe_skew_join" -> aqeSkewJoinSql)
}
