package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc
import graft.plans.PointInInterval

class PointInIntervalSpec extends AnyFunSuite {
  import TestSpark._

  test("custom exec matches the composed equi+range join, and is planned") {
    val events = Tables.events(spark, sf)
    val versions = Cdc.scd2History(events)
      .select(col("key_id"), col("value").as("v_value"),
        col("__start_at"), col("__end_at"))
    val points = Cdc.stage(events)
      .select(col("key_id").as("p_key"), col("sequence_number"))

    val custom = PointInInterval.join(spark, points, versions,
      leftKey = "p_key", rightKey = "key_id", pointCol = "sequence_number",
      startCol = "__start_at", endCol = "__end_at")

    val planned = custom.queryExecution.sparkPlan.collect {
      case e: graft.plans.PointInIntervalJoinExec => e
    }
    assert(planned.nonEmpty, "custom exec not planned")

    val got = custom.select(col("p_key"), col("sequence_number"), col("__start_at"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val expected = points.join(versions,
        points("p_key") === versions("key_id") &&
        points("sequence_number") >= versions("__start_at") &&
        (versions("__end_at").isNull ||
          points("sequence_number") < versions("__end_at")))
      .select(col("p_key"), col("sequence_number"), col("__start_at"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == expected,
      s"mismatch: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty)
  }

  test("handles empty version lists, open intervals, and null starts") {
    import spark.implicits._
    val versions = Seq(
      (1L, Some(10L), Some(20L), "v1"), (1L, Some(20L), None, "v2"),
      (3L, Some(5L), Some(6L), "x1"),
      (4L, None, None, "broken"), (4L, Some(1L), None, "v4"))
      .toDF("key_id", "__start_at", "__end_at", "payload")
      .select(col("key_id"), col("__start_at").cast("long").as("__start_at"),
        col("__end_at").cast("long").as("__end_at"), col("payload"))
    val points = Seq((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 99L),
      (2L, 10L), (3L, 6L), (4L, 2L)).toDF("p_key", "p")
    val joined = PointInInterval.join(spark, points, versions,
      "p_key", "key_id", "p", "__start_at", "__end_at")
    // direct collect with NO projection on top: the exec must emit
    // UnsafeRow (regression for the JoinedRow leak)
    val raw = joined.collect()
    assert(raw.length == 5)
    val out = joined
      .select(col("p_key"), col("p"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 10L, "v1"), (1L, 19L, "v1"), // inside closed interval
      (1L, 20L, "v2"), (1L, 99L, "v2"), // boundary + open interval
      (4L, 2L, "v4"))) // null-start version row must not wedge the key
    // p=5 before first version, key 2 unknown, key 3 point at exclusive end: no match
  }
}
