package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TransformState

class TransformStateSpec extends AnyFunSuite {
  import TestSpark._

  test("transformWithState running totals equal the batch window") {
    val out = TransformState.runningStats(spark, sf)
    val events = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val batch = events.select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("cum_events"),
      (sum((coalesce(col("value"), lit(0.0))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * lit(10000))
        .cast("long")).over(w) / 10000.0).as("cum_value"))
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val want = batch.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == want.size && got.nonEmpty)
    want.foreach { case (id, v) => assert(got(id) == v, s"event $id") }
  }

  test("repeated runs are isolated (no leaked sink views or state)") {
    val a = TransformState.runningStats(spark, sf).count()
    val b = TransformState.runningStats(spark, sf).count()
    assert(a == b && a > 0)
  }

  test("event-time timers fire once per user at last_seen + gap") {
    val got = TransformState.inactivityTimeout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // exactly one alert per user (re-arming deleted stale timers)
    assert(got.map(_._1).distinct.length == got.length)
    val want = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(max(col("ts_us")).as("last"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length == want.size)
    got.foreach { case (u, seen, exp) =>
      assert(seen == want(u), s"user $u last_seen")
      assert(exp == seen + 30L * 60 * 1000000)
    }
  }

  test("state TTL physically drops idle keys and restarts their counter") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val ttl = java.time.Duration.ofSeconds(2)
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_ttl_spec").toString
    val feed = graft.sources.Scratch.dir("ttl_spec_feed")
    val out = graft.sources.Scratch.dir("ttl_spec_out")
    // run 1: users 1..10, one event each
    (1L to 10L).map(i => (i, i)).toDF("event_id", "user_id")
      .coalesce(1).write.parquet(s"$feed/batch0")
    def runOnce(): Seq[Long] = {
      val schema = s.read.parquet(s"$feed/batch0").schema
      val q = s.readStream.schema(schema).parquet(s"$feed/*")
        .as[TransformState.TtlIn]
        .groupByKey(_.user_id)
        .transformWithState(new TransformState.TtlCountProcessor(ttl),
          org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
          org.apache.spark.sql.streaming.OutputMode.Append(),
          org.apache.spark.sql.Encoders.product[TransformState.TtlOut])
        .toDF().writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
          ()
        }
        .start()
      q.awaitTermination()
      q.recentProgress.toSeq
        .flatMap(_.stateOperators).map(_.numRowsTotal)
    }
    val rows1 = runOnce()
    Thread.sleep(ttl.toMillis + 500)
    // run 2: only user 1 returns; 2..10 stay idle past the TTL
    Seq((100L, 1L)).toDF("event_id", "user_id")
      .coalesce(1).write.parquet(s"$feed/batch1")
    val rows2 = runOnce()
    // the framework PHYSICALLY removed expired rows: the store shrank
    // below run 1's peak even though a key got NEW input in run 2
    assert(rows1.nonEmpty && rows2.nonEmpty)
    assert(rows2.max < rows1.max,
      s"state rows never decreased: run1=$rows1 run2=$rows2")
    val snap = s.read.parquet(out).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> rs.maxBy(_.getLong(1)).getLong(2) // latest n_live
      }
    // user 1's counter RESTARTED at 1 (not 2): its run-1 state expired
    assert(snap(1L) == 1L, s"user 1 counter did not restart: $snap")
    (2L to 10L).foreach(u => assert(snap(u) == 1L))
    // and user 1 emitted twice (emits var is TTL-free and survived)
    assert(s.read.parquet(out).filter(col("user_id") === 1L).count() == 2L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(checkpoint))
  }

  test("MapState per-type counters accumulate across batches") {
    val got = TransformState.userTypeCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    val want = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("ListState top-k ranking survives batch boundaries") {
    val got = TransformState.userTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // equals the batch rank-k window over ALL events, which only holds
    // if early-batch entries persisted in the list state across the
    // three-microbatch feed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("vs").desc, col("event_id"))
    val want = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) *
          lit(10000)).cast("long").as("vs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("user_id"), col("rank").cast("int"), col("event_id"),
        (col("vs") / 10000.0).as("value"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == want.toSet)
    // per user at most k rows and ranks are 1..n contiguous
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length))
    }
  }
}
