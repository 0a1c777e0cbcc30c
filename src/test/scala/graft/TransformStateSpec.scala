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
}
