package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, SessionOut}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("stream_windowed_agg equals the batch aggregation") {
    val streamed = EventStreams.windowedAgg(spark, sf)
      .orderBy("window_start", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts_utc")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        operators.Medallion.dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("stream_windowed_append flushes every real window exactly once") {
    val streamed = EventStreams.windowedAppend(spark, sf)
      .orderBy("window_start", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts_utc")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        operators.Medallion.dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length) // no drops, no dup emission
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming CDC apply converges to the batch SCD1 state") {
    val applied = EventStreams.streamCdcApply(spark, sf)
      .orderBy("key_id").collect()
    val batch = operators.Cdc.scd1Current(Tables.events(spark, sf))
      .orderBy("key_id").collect()
    assert(applied.length == batch.length)
    applied.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("streaming dropDuplicates removes cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("event_id", "value")
      .dropDuplicates("event_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream_out").start()
    try {
      mem.addData(Seq((1L, 1.0), (2L, 2.0), (1L, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq((2L, 2.0), (3L, 3.0))) // dup arrives in a LATER batch
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    spark.catalog.dropTempView("dedup_stream_out")
  }

  test("stream-stream interval join matches across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val c = clicks.toDF().toDF("click_id", "click_ts", "user_id")
      .withWatermark("click_ts", "1 hour")
    val b = buys.toDF().toDF("purchase_id", "purchase_ts", "p_user")
      .withWatermark("purchase_ts", "1 hour")
    val j = c.join(b, col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"))
    val q = j.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_spec_out").start()
    try {
      val t = (s: String) => java.sql.Timestamp.valueOf(s)
      clicks.addData((1L, t("2024-01-01 10:00:00"), 7L))
      q.processAllAvailable() // click arrives a batch BEFORE any purchase
      buys.addData(
        (100L, t("2024-01-01 10:30:00"), 7L),  // in window → match
        (101L, t("2024-01-01 12:00:00"), 7L),  // past window → no match
        (102L, t("2024-01-01 10:30:00"), 8L))  // other user → no match
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_spec_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 100L)))
    spark.catalog.dropTempView("ssj_spec_out")
  }

  test("left-outer stream join emits unmatched clicks on watermark advance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val c = clicks.toDF().toDF("click_id", "click_ts", "user_id")
      .withWatermark("click_ts", "1 hour")
    val b = buys.toDF().toDF("purchase_id", "purchase_ts", "p_user")
      .withWatermark("purchase_ts", "1 hour")
    val j = c.join(b, col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("click_id"), coalesce(col("purchase_id"), lit(-1L)))
    val q = j.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("soj_spec_out").start()
    try {
      val t = (s: String) => java.sql.Timestamp.valueOf(s)
      clicks.addData(
        (1L, t("2024-01-01 10:00:00"), 7L),  // will match
        (2L, t("2024-01-01 10:00:00"), 8L))  // will never match
      buys.addData((100L, t("2024-01-01 10:30:00"), 7L))
      q.processAllAvailable()
      // click 2 is unmatched but must NOT emit yet: its window's close
      // is not behind the watermark, so a matching purchase could still
      // arrive
      val early = spark.table("soj_spec_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(early == Set((1L, 100L)),
        s"unmatched row emitted before the watermark proved it: $early")
      // watermark advance on BOTH sides pushes past click 2's window →
      // the null-padded row flushes
      clicks.addData((3L, t("2024-01-02 00:00:00"), 9L))
      buys.addData((101L, t("2024-01-02 00:00:00"), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("soj_spec_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((2L, -1L)), s"unmatched click never emitted: $rows")
    assert(rows.contains((1L, 100L)))
    spark.catalog.dropTempView("soj_spec_out")
  }

  test("stateful streaming sessionizer agrees with batch gap windows") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts_us").as("ts"), col("user_id"),
        col("value"))
      .as[Ev].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionizeStreaming(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out").start()
    try {
      mem.addData(events)
      q.processAllAvailable()
    } finally q.stop()

    val closed = spark.table("sessions_out").as[SessionOut].collect()
      .map(s => (s.user_id, s.first_event_id, s.last_event_id, s.n_events)).toSet

    val batch = EventStreams.sessionizeBatch(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event_id"),
        r.getAs[Long]("last_event_id"), r.getAs[Long]("n_events"))).toSet

    // streaming emits only CLOSED sessions; every emitted session must
    // match a batch session exactly, and most batch sessions close
    assert(closed.nonEmpty)
    assert(closed.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${(closed -- batch).take(3)}")
    val open = batch -- closed
    // at most one open session per user can remain unemitted
    val users = events.map(_.user_id).distinct.size
    assert(open.size <= users)
  }

  test("append-mode windowed agg state plateaus at the watermark horizon") {
    // the state-bound claim behind stream_windowed_append: with
    // withWatermark + APPEND mode, closed windows are EVICTED from the
    // state store, so state is O(windows inside the horizon) — not
    // O(all windows ever seen). Observed via
    // lastProgress.stateOperators.numRowsTotal across 24 microbatches
    // that each advance event time by one hour.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "2 hours")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour"))
      .agg(sum(col("v")).as("total"))
      .writeStream.outputMode("append")
      .format("memory").queryName("state_bound_windows")
      .start()
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val stateSizes =
      try (0 until 24).map { h =>
        mem.addData((new java.sql.Timestamp(base + h * 3600L * 1000), 1.0))
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    // 24 distinct hourly windows entered the stream...
    val emitted = spark.sql("SELECT count(*) FROM state_bound_windows")
      .head().getLong(0)
    assert(emitted >= 20, s"append mode should have flushed most windows: $emitted")
    // ...but state holds only the ~3 windows inside the 2h horizon
    // (window end > watermark), PLATEAUING instead of growing with input
    val warm = stateSizes.drop(6)
    assert(warm.max <= 6,
      s"state grew with input instead of plateauing: $stateSizes")
    assert(stateSizes.last <= 6)
  }
}
