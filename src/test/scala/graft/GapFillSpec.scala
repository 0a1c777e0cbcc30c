package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GapFill

class GapFillSpec extends AnyFunSuite {
  import TestSpark._

  test("spine is dense per user and fills carry forward") {
    val out = GapFill.gapFill(Tables.events(spark, sf)).orderBy("user_id", "day")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // dense: per user, row count == day span
    val spans = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
      .collect()
    spans.foreach(r => assert(r.getLong(1) == r.getInt(2).toLong))
    // gap rows: n_events == 0, day_value null, filled_value non-null,
    // days_since_active > 0
    val gaps = rows.filter(_.getLong(2) == 0L)
    assert(gaps.nonEmpty, "fixture has no gap days — UserMod slice too dense")
    gaps.foreach { r =>
      assert(r.isNullAt(3))
      assert(!r.isNullAt(4))
      assert(r.getLong(5) > 0L)
    }
    // active rows: filled_value == day_value, days_since_active == 0
    rows.filter(_.getLong(2) > 0L).foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4))
      assert(r.getLong(5) == 0L)
    }
  }
}
