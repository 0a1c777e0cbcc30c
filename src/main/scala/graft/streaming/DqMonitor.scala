package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Quality.{Action, Expectation}

/** STREAMING data-quality monitoring — the reference's expectations run
  * the way DLT actually runs them: CONTINUOUSLY, per microbatch, with
  * violation counts accumulating into an observable metrics table
  * (the event-log `flow_progress.data_quality` analog) rather than one
  * batch report. Reuses [[graft.operators.Quality.Expectation]] — one
  * definition of a rule serves batch enforcement, the batch metrics
  * report, and this monitor.
  *
  * Per microbatch: ONE conditional-sum aggregate evaluates every rule
  * (map-side combinable, the dq_metrics discipline) grouped by the
  * feed bucket carried IN the data — so the accumulated metrics are
  * batch-boundary-independent (file→batch-id assignment is arrival
  * order, which no oracle should depend on), and the final rollup is
  * deterministic however the stream was chopped. Appended rows are
  * O(buckets × 1) per batch: the metrics table stays metadata-sized
  * while the stream is unbounded.
  */
object DqMonitor {

  /** The monitored rules over the RAW events feed (Warn action: a
    * monitor observes, enforcement is the silver job's decision).
    */
  def rules: Seq[Expectation] = Seq(
    Expectation("user_present", col("user_id").isNotNull, Action.Warn),
    Expectation("value_nonneg",
      col("value").isNotNull && col("value") >= 0, Action.Warn),
    Expectation("event_type_present",
      col("event_type").isNotNull, Action.Warn))

  def streamDqMonitor(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val feed = graft.sources.Scratch.dir("dqmon_feed")
    val metrics = graft.sources.Scratch.dir("dqmon_metrics")
    val checkpoint = Files.createTempDirectory("graft_dqmon_ckpt").toString
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_id").isNotNull) // a null id has no bucket
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), pmod(col("event_id"), lit(3)).as("feed_bucket"))
    ev.repartition(1).write.partitionBy("feed_bucket").parquet(feed)
    // the partition column lives in the DIRECTORY name — the declared
    // stream schema must carry it explicitly
    val feedSchema = spark.read.parquet(s"$feed/feed_bucket=0").schema
      .add("feed_bucket", org.apache.spark.sql.types.IntegerType)
    val q = spark.readStream.schema(feedSchema)
      .option("basePath", feed) // partition values parse from dirs
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/feed_bucket=*")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one pass, every rule as a conditional sum
        val aggs = count(lit(1)).as("n_rows") +:
          rules.map(r => sum(when(!coalesce(r.predicate, lit(false)), 1L)
            .otherwise(0L)).as(s"v_${r.name}"))
        batch.groupBy(col("feed_bucket"))
          .agg(aggs.head, aggs.tail: _*)
          .write.mode("append").parquet(metrics)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    // rollup + melt to the per-rule grain (batch-boundary independent)
    val rollup = sum(col("n_rows")).as("n_rows") +:
      rules.map(r => sum(col(s"v_${r.name}")).as(s"v_${r.name}"))
    // ONE aggregate pass serves both surfaces: the collected rollup is
    // metadata-sized (one row per feed bucket), and melts on the driver
    // to the per-rule gate grain AND to the ledger sums — the previous
    // shape re-ran the whole aggregation a second time just to publish
    // the event_log rows.
    // feed_bucket is IntegerType (declared in the stream schema above) —
    // cast to long HERE so the collected rows box java.lang.Long and the
    // getAs[Long] reads below cannot ClassCastException.
    val wideRows = spark.read.parquet(metrics)
      .groupBy(col("feed_bucket").cast("long").as("feed_bucket"))
      .agg(rollup.head, rollup.tail: _*)
      .collect().toSeq
    import spark.implicits._
    val out = (for {
      row <- wideRows; r <- rules
    } yield (row.getAs[Long]("feed_bucket"), r.name,
      row.getAs[Long]("n_rows"), row.getAs[Long](s"v_${r.name}")))
      .toDF("feed_bucket", "rule_name", "n_rows", "n_violations")
    // the monitor's accumulated metrics are ALSO observability events:
    // publish the rollup to the event_log ledger so
    // `SELECT * FROM event_log('stream_dq_monitor')` serves them (the
    // reference's flow_progress.data_quality surface). The replace is
    // ATOMIC (one map swap) — concurrent invocations serve either run's
    // complete event set, never an interleaving.
    graft.plans.EventLog.replaceExpectations("stream_dq_monitor",
      "events_feed",
      rules.map(r =>
        r.name -> wideRows.map(_.getAs[Long](s"v_${r.name}")).sum)
        .sortBy(_._1))
    out
  }

  val streamDqMonitorSql: String =
    """WITH e AS (
         SELECT ((event_id % 3) + 3) % 3 AS feed_bucket, user_id,
           event_type, value
         FROM events WHERE event_id IS NOT NULL),
       g AS (
         SELECT feed_bucket, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS v_user_present,
           CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS v_value_nonneg,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS v_event_type_present
         FROM e GROUP BY 1)
       SELECT feed_bucket, 'user_present' AS rule_name, n_rows,
         v_user_present AS n_violations FROM g
       UNION ALL
       SELECT feed_bucket, 'value_nonneg', n_rows, v_value_nonneg FROM g
       UNION ALL
       SELECT feed_bucket, 'event_type_present', n_rows,
         v_event_type_present FROM g
       ORDER BY feed_bucket, rule_name"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_dq_monitor" -> ((s, d) =>
      streamDqMonitor(s, d).orderBy(col("feed_bucket"), col("rule_name"))))

  def oracles: Map[String, String] = Map(
    "stream_dq_monitor" -> streamDqMonitorSql)
}
