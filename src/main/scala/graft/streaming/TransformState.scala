package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  final case class MapIn(event_id: Long, user_id: Long, event_type: String)
  final case class MapOut(user_id: Long, n_seen: Long, event_type: String,
      n_events: Long)

  /** Per-user per-type counters via MAP state — with this, all four
    * `transformWithState` state surfaces are exercised (ValueState:
    * [[RunningStatsProcessor]], ListState: [[TopKProcessor]], timers:
    * [[InactivityProcessor]], MapState: here). The store holds one
    * (type → count) entry per observed type per user — point lookups
    * and updates without deserializing the whole map, which is the
    * reason MapState exists over a ValueState[Map]: at 100 TB a user's
    * map is updated per event, not rewritten per event. Emissions are
    * the full current map tagged with monotone `n_seen`; the consumer
    * takes each user's latest snapshot ([[TopKProcessor]]'s
    * changelog→snapshot read).
    */
  final class TypeCountsProcessor
    extends StatefulProcessor[Long, MapIn, MapOut] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[MapIn],
        timers: TimerValues): Iterator[MapOut] = {
      var n = 0L
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1L)
        n += 1L
      }
      val total = (if (seen.exists()) seen.get() else 0L) + n
      seen.update(total)
      counts.iterator().map { case (tpe, c) =>
        MapOut(key, total, tpe, c)
      }
    }
  }

  /** Per-user event-type histogram across a three-microbatch feed,
    * read back as the latest snapshot per user. Oracle: the batch
    * (user, type) count.
    */
  def userTypeCounts(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("graft_tmap_ckpt").toString
    val feed = graft.sources.Scratch.dir("tmap_feed")
    val queryName = s"stream_tmap_${System.identityHashCode(spark)}"
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.withColumn("b", pmod(col("event_id"), lit(3)))
      .repartition(1).write.partitionBy("b").parquet(feed)
    val feedSchema = spark.read.parquet(s"$feed/b=0").schema
    val src = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/b=*")
      .as[MapIn]
    val out = src.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[MapOut])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val res = spark.table(queryName)
      .withColumn("mx", max(col("n_seen")).over(w))
      .filter(col("n_seen") === col("mx"))
      .select(col("user_id"), col("event_type"), col("n_events"))
      .localCheckpoint(eager = true)
    spark.catalog.dropTempView(queryName)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    res
  }

  val userTypeCountsSql: String =
    """SELECT user_id, event_type, COUNT(*) AS n_events
       FROM events
       WHERE user_id IS NOT NULL
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  final case class TimerIn(event_id: Long, ts_utc: java.sql.Timestamp,
      user_id: Long, ts_us: Long)
  final case class TimerOut(user_id: Long, last_seen_us: Long,
      expired_at_us: Long)

  /** Inactivity detection via EVENT-TIME TIMERS — the remaining
    * `transformWithState` surface ([[RunningStatsProcessor]] covers
    * ValueState, [[TopKProcessor]] ListState): each input re-arms the
    * user's single timer at `last_seen + gap` (previous timers
    * explicitly deleted — `listTimers`/`deleteTimer` keep exactly one
    * armed per key), and when the WATERMARK passes the deadline the
    * framework calls `handleExpiredTimer`, which emits the alert from
    * state. Emission is thus driven by event-time progress, not by
    * data arrival — the semantics a fixed-gap inactivity monitor needs
    * at any scale (state: one timestamp + one timer per active user).
    */
  final class InactivityProcessor(gapUs: Long)
    extends StatefulProcessor[Long, TimerIn, TimerOut] {
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("last_seen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimerIn],
        timers: TimerValues): Iterator[TimerOut] = {
      // ts_us, not ts_utc.getTime*1000: getTime is MILLIS and would
      // truncate the micros the oracle compares exactly
      val maxUs = rows.map(_.ts_us).max
      val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (maxUs > prev) {
        lastSeen.update(maxUs)
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer((maxUs + gapUs) / 1000L) // timer API is ms
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TimerOut] = {
      val seen = lastSeen.get()
      Iterator.single(TimerOut(key, seen, seen + gapUs))
    }
  }

  /** Every user's final inactivity alert: one real batch arms the
    * timers, a far-future sentinel advances the watermark so each
    * user's deadline passes and fires exactly once. Oracle: per-user
    * max event time + gap.
    */
  def inactivityTimeout(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    val checkpoint = Files.createTempDirectory("graft_inact_ckpt").toString
    val feed = graft.sources.Scratch.dir("inact_feed")
    val queryName = s"stream_inact_${System.identityHashCode(spark)}"
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts_utc"), col("user_id"))
    ev.coalesce(1).write.parquet(s"$feed/batch0")
    Seq((-1L, java.sql.Timestamp.valueOf("2100-01-01 00:00:00"), -1L))
      .toDF("event_id", "ts_utc", "user_id")
      .coalesce(1).write.parquet(s"$feed/batch1")
    new java.io.File(new java.io.File(feed), "batch1").listFiles()
      .foreach(f => f.setLastModified(System.currentTimeMillis() + 600000))
    val feedSchema = spark.read.parquet(s"$feed/batch0").schema
    val src = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*")
      .withWatermark("ts_utc", "1 second")
      .withColumn("ts_us", unix_micros(col("ts_utc")))
      .as[TimerIn]
    val out = src.groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[TimerOut])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    val res = spark.table(queryName)
      .filter(col("user_id") >= 0) // drop the sentinel's own alert
      .localCheckpoint(eager = true)
    spark.catalog.dropTempView(queryName)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    res
  }

  val inactivityTimeoutSql: String =
    """SELECT user_id, MAX(epoch_us(ts)) AS last_seen_us,
         MAX(epoch_us(ts)) + 1800000000 AS expired_at_us
       FROM events
       WHERE user_id IS NOT NULL
       GROUP BY 1
       ORDER BY 1"""

  final case class TopIn(event_id: Long, user_id: Long, value_s: Long)
  final case class TopEntry(value_s: Long, event_id: Long)
  final case class TopOut(user_id: Long, n_seen: Long, rank: Int,
      event_id: Long, value: Double)

  /** Per-user streaming top-k via LIST state — the state-variable type
    * [[RunningStatsProcessor]]'s ValueState doesn't cover: the store
    * holds ≤ k (value, id) entries per user, merged with each batch's
    * arrivals and truncated (value DESC, event_id ASC — the id
    * tiebreak keeps the ranking total). Every batch RE-EMITS the key's
    * current ranking tagged with a monotone `n_seen`; the consumer
    * keeps each user's max-n_seen emission — the standard
    * changelog-then-latest-snapshot read of an updating stream (the
    * memory sink is append-only, so the snapshot filter lives in the
    * batch query over it).
    */
  final class TopKProcessor(k: Int)
    extends StatefulProcessor[Long, TopIn, TopOut] {
    @transient private var top: ListState[TopEntry] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[TopEntry]("topk",
        Encoders.product[TopEntry], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TopIn],
        timers: TimerValues): Iterator[TopOut] = {
      val incoming = rows.map(e => TopEntry(e.value_s, e.event_id)).toArray
      val prior = if (top.exists()) top.get().toArray else Array.empty[TopEntry]
      val merged = (prior ++ incoming)
        .sortBy(e => (-e.value_s, e.event_id)).take(k)
      top.put(merged)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.length
      seen.update(n)
      merged.iterator.zipWithIndex.map { case (e, i) =>
        TopOut(key, n, i + 1, e.event_id, e.value_s / 10000.0)
      }
    }
  }

  /** Per-user top-3 event values across a THREE-batch feed (state must
    * survive batch boundaries), read back as the latest snapshot per
    * user. Oracle: the batch rank-3 window.
    */
  def userTopK(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("graft_topk_ckpt").toString
    val feed = graft.sources.Scratch.dir("topk_feed")
    val queryName = s"stream_topk_${System.identityHashCode(spark)}"
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) *
          lit(10000)).cast("long").as("value_s"))
    // three files → three microbatches: the ranking must merge state
    // across all of them
    ev.withColumn("b", pmod(col("event_id"), lit(3)))
      .repartition(1).write.partitionBy("b").parquet(feed)
    val feedSchema = spark.read.parquet(s"$feed/b=0").schema
    val src = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/b=*")
      .as[TopIn]
    val out = src.groupByKey(_.user_id)
      .transformWithState(new TopKProcessor(3),
        TimeMode.None(), OutputMode.Append(), Encoders.product[TopOut])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    // latest snapshot per user: the emission with that user's max n_seen
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val res = spark.table(queryName)
      .withColumn("mx", max(col("n_seen")).over(w))
      .filter(col("n_seen") === col("mx"))
      .select(col("user_id"), col("rank"), col("event_id"), col("value"))
      .localCheckpoint(eager = true)
    spark.catalog.dropTempView(queryName)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    res
  }

  val userTopKSql: String =
    """SELECT user_id, CAST(rank AS INT) AS rank, event_id,
         CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
       FROM (
         SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY CAST(value AS DECIMAL(18,4)) DESC, event_id) AS rank
         FROM events
         WHERE user_id IS NOT NULL AND value IS NOT NULL)
       WHERE rank <= 3
       ORDER BY user_id, rank"""

  final case class TtlIn(event_id: Long, user_id: Long)
  final case class TtlOut(user_id: Long, emit_seq: Long, n_live: Long)

  /** STATE TTL — the fourth state-lifecycle surface after
    * Value/List/Map state and timers: the per-user counter is declared
    * with a processing-time [[TTLConfig]], so a key idle longer than
    * the TTL has its state EXPIRED by the framework — `exists()` turns
    * false and the counter RESTARTS — without any user-written cleanup
    * code. That is the operational contract that keeps a 100 TB
    * deployment's state store bounded by ACTIVE keys instead of
    * ever-seen keys. The `emits` tag is deliberately TTL-free: it
    * survives to prove expiry is per-STATE-VARIABLE, not per-key, and
    * it orders emissions for the snapshot read.
    */
  final class TtlCountProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, TtlIn, TtlOut] {
    @transient private var n: ValueState[Long] = _
    @transient private var emits: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      n = getHandle.getValueState[Long]("n_ttl",
        Encoders.scalaLong, TTLConfig(ttl))
      emits = getHandle.getValueState[Long]("emits",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TtlIn],
        timers: TimerValues): Iterator[TtlOut] = {
      val cur = if (n.exists()) n.get() else 0L // expired ⇒ restart at 0
      val upd = cur + rows.size
      n.update(upd)
      val e = (if (emits.exists()) emits.get() else 0L) + 1L
      emits.update(e)
      Iterator.single(TtlOut(key, e, upd))
    }
  }

  /** Two single-batch (`Trigger.Once`) runs over ONE checkpoint,
    * separated by a real pause longer than the TTL: run 1 counts every
    * user's even-id events; after the pause, run 2's users find their
    * counter EXPIRED and restart on their odd-id events. Latest
    * snapshot per user ⇒ users with odd events report only the
    * post-expiry count, users without keep the run-1 snapshot —
    * exactly what the oracle computes from the static table.
    * Determinism: run 2's batch timestamp is ≥ run 1's end + the
    * sleep, which exceeds the TTL, and TTL expiry is evaluated against
    * the batch timestamp — no wall-clock race in either direction.
    *
    * Why Trigger.Once and not `processAllAvailable`/AvailableNow: TTL
    * requires [[TimeMode.ProcessingTime]], where the operator requests
    * a new microbatch every trigger (the clock always "advanced"), so
    * both draining disciplines schedule batches forever. Trigger.Once
    * runs exactly one batch and stops unconditionally; state —
    * including each variable's TTL metadata — resumes from the
    * checkpoint, which is itself worth proving. Emissions accumulate
    * in a parquet sink across runs (the memory sink would reset on
    * restart).
    */
  def stateTtl(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ttl = java.time.Duration.ofSeconds(2)
    val checkpoint = Files.createTempDirectory("graft_ttl_ckpt").toString
    val feed = graft.sources.Scratch.dir("ttl_feed")
    val out = graft.sources.Scratch.dir("ttl_out")
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"))
    ev.filter(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.parquet(s"$feed/batch0")
    def runOnce(): Unit = {
      import spark.implicits._
      val feedSchema = spark.read.parquet(s"$feed/batch0").schema
      val src = spark.readStream.schema(feedSchema)
        .parquet(s"$feed/*")
        .as[TtlIn]
      val q = src.groupByKey(_.user_id)
        .transformWithState(new TtlCountProcessor(ttl),
          TimeMode.ProcessingTime(), OutputMode.Append(),
          Encoders.product[TtlOut])
        .toDF().writeStream.outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
          ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce() // run 1: every even-id count lands
    Thread.sleep(ttl.toMillis + 500) // idle past the TTL
    ev.filter(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.parquet(s"$feed/batch1")
    runOnce() // run 2: returning users find expired state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val res = spark.read.parquet(out)
      .withColumn("mx", max(col("emit_seq")).over(w))
      .filter(col("emit_seq") === col("mx"))
      .select(col("user_id"), col("n_live"))
      .localCheckpoint(eager = true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    res
  }

  val stateTtlSql: String =
    """WITH per AS (
         SELECT user_id,
           COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_odd,
           COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_even
         FROM events
         WHERE user_id IS NOT NULL
         GROUP BY 1)
       SELECT user_id,
         CASE WHEN n_odd > 0 THEN n_odd ELSE n_even END AS n_live
       FROM per
       ORDER BY user_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_state_ttl" -> ((s, d) =>
      stateTtl(s, d).orderBy(col("user_id"))),
    "stream_user_topk" -> ((s, d) =>
      userTopK(s, d).orderBy(col("user_id"), col("rank"))),
    "stream_inactivity_timeout" -> ((s, d) =>
      inactivityTimeout(s, d).orderBy(col("user_id"))),
    "stream_user_type_counts" -> ((s, d) =>
      userTypeCounts(s, d).orderBy(col("user_id"), col("event_type"))),
    "stream_transform_state" -> ((s, d) =>
      runningStats(s, d).orderBy(col("event_id"))),
    "stream_session_window" -> ((s, d) =>
      sessionWindowStream(s, d).orderBy(col("user_id"), col("start_us"))))

  def oracles: Map[String, String] = Map(
    "stream_state_ttl" -> stateTtlSql,
    "stream_user_topk" -> userTopKSql,
    "stream_inactivity_timeout" -> inactivityTimeoutSql,
    "stream_user_type_counts" -> userTypeCountsSql,
    "stream_transform_state" -> runningStatsSql,
    // identical session semantics to the batch twin — same oracle
    "stream_session_window" ->
      graft.operators.AnalyticsExt.eventsSessionWindowSql)
}
