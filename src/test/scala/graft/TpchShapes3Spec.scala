package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchShapes3

class TpchShapes3Spec extends AnyFunSuite {
  import TestSpark._

  test("q9 plan broadcasts the filtered part and supplier-nation chains") {
    val df = TpchShapes3.q9Profit(Tables.lineitem(spark, sf),
      Tables.part(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.orders(spark, sf))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the part-name filter sits on the dimension scan, not post-join:
    // the Contains predicate appears below the part-side join input
    val optimized = df.queryExecution.optimizedPlan.toString
    val filterIdx = optimized.indexOf(TpchShapes3.NameFilter)
    val joinIdx = optimized.indexOf("Join")
    assert(filterIdx > joinIdx && joinIdx >= 0)
  }
}
