package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing via Spark 4's `transformWithState`
  * (the successor of `mapGroupsWithState`: typed per-key state
  * variables behind a handle, timer support, TTL) — here a per-user
  * running-totals processor, the streaming form of a cumulative
  * window. State is ONE small record per user (count + scaled sum):
  * O(active users), never O(events).
  *
  * Determinism contract: the running sum accumulates the DECIMAL(18,4)
  * UNSCALED long of `value` (exact integer adds in arrival order; the
  * within-batch order is pinned by an explicit (ts, event_id) sort, the
  * cross-batch caveat is the same as the sessionizer's) and divides by
  * 10⁴ only at emit. The oracle's decimal cumulative window sum is the
  * same rational, so the doubles match bit-for-bit.
  */
object TransformState {

  final case class EvIn(event_id: Long, ts_us: Long, user_id: Long,
      value_s: Long)
  final case class RunOut(event_id: Long, user_id: Long, cum_events: Long,
      cum_value: Double)
  final case class RunState(n: Long, sum_s: Long)

  final class RunningStatsProcessor
    extends StatefulProcessor[Long, EvIn, RunOut] {
    @transient private var state: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState]("running",
        Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
        timers: TimerValues): Iterator[RunOut] = {
      // within a micro-batch the iterator order is not defined: pin it
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
      var st = if (state.exists()) state.get() else RunState(0L, 0L)
      val out = sorted.map { e =>
        st = RunState(st.n + 1L, st.sum_s + e.value_s)
        RunOut(e.event_id, key, st.n, st.sum_s / 10000.0)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Per-user running (count, value-sum) per event, as a REAL streaming
    * query: file source → transformWithState → memory sink (the
    * [[EventStreams.windowedAgg]] harness discipline). RocksDB state
    * store: `transformWithState` requires it — also the provider a
    * 100 TB deployment would run, state spills off-heap instead of
    * living on the executor heap.
    */
  def runningStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val checkpoint = Files.createTempDirectory("graft_tws_ckpt").toString
    val queryName = s"stream_transform_state_${System.identityHashCode(spark)}"
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampNTZType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType))))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"),
        unix_micros(col("ts").cast(
          org.apache.spark.sql.types.TimestampType)).as("ts_us"),
        col("user_id"),
        // DECIMAL(18,4) unscaled long of value — exact adds in state
        (coalesce(col("value"), lit(0.0))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)) *
          lit(10000)).cast("long").as("value_s"))
      .as[EvIn]
    val out = src.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[RunOut])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    val res = spark.table(queryName).localCheckpoint(eager = true)
    spark.catalog.dropTempView(queryName)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    res
  }

  val runningStatsSql: String =
    """SELECT event_id, user_id,
       COUNT(*) OVER w AS cum_events,
       CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,4))) OVER w AS DOUBLE)
         AS cum_value
       FROM events
       WHERE user_id IS NOT NULL
       WINDOW w AS (PARTITION BY user_id
         ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING)
       ORDER BY event_id"""

  /** STREAMING session windows — the stateful SessionWindow operator
    * (merging windows in the state store as events arrive, emitting a
    * session only once the watermark passes its close) — against the
    * batch twin `events_session_window`, which shares this oracle. The
    * two-batch feed + far-future sentinel is the
    * [[EventStreams.windowedAppend]] discipline: all real events land
    * in one microbatch, the sentinel advances the watermark past every
    * real session's close so append mode flushes them all; the
    * sentinel's own session stays open and is never emitted.
    */
  def sessionWindowStream(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("graft_sw_ckpt").toString
    val feed = graft.sources.Scratch.dir("sw_feed")
    val out = graft.sources.Scratch.dir("sw_out")
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts_utc"), col("user_id"), col("value"))
    ev.coalesce(1).write.parquet(s"$feed/batch0")
    val sentinelTs = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    Seq((-1L, sentinelTs, -1L, 0.0))
      .toDF("event_id", "ts_utc", "user_id", "value")
      .coalesce(1).write.parquet(s"$feed/batch1")
    val fsDir = new java.io.File(feed)
    new java.io.File(fsDir, "batch1").listFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() + 600000))
    val feedSchema = spark.read.parquet(s"$feed/batch0").schema
    val q = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*")
      .withWatermark("ts_utc", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts_utc"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Medallion.dsum(col("value")).as("session_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("session_value"))
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    spark.read.parquet(out).localCheckpoint(eager = true)
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_transform_state" -> ((s, d) =>
      runningStats(s, d).orderBy(col("event_id"))),
    "stream_session_window" -> ((s, d) =>
      sessionWindowStream(s, d).orderBy(col("user_id"), col("start_us"))))

  def oracles: Map[String, String] = Map(
    "stream_transform_state" -> runningStatsSql,
    // identical session semantics to the batch twin — same oracle
    "stream_session_window" ->
      graft.operators.AnalyticsExt.eventsSessionWindowSql)
}
