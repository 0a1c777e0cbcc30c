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

  test("stateful streaming sessionizer agrees with batch gap windows") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
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
}
