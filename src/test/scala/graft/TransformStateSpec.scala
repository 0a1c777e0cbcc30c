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
