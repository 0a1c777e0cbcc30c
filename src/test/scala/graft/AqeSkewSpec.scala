package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AqeSkew

class AqeSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("AQE detects and splits the skewed join partition") {
    AqeSkew.withSkewConfs(spark) {
      val df = AqeSkew.skewedRollup(Tables.events(spark, sf))
      // drive THIS df's queryExecution (count() would plan a new one)
      assert(df.collect().length > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew split in the final AQE plan:\n$plan")
    }
  }

  test("the skew-handled result equals the plain rollup") {
    val evs = Tables.events(spark, sf)
    val got = AqeSkew.aqeSkewJoin(spark, evs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val plain = AqeSkew.skewedRollup(evs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == plain)
  }
}
