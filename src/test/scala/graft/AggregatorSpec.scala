package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

class AggregatorSpec extends AnyFunSuite {
  import TestSpark._

  test("TopKAggregator returns the k largest values per group") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("k"),
        col("l_extendedprice").as("v"), col("l_orderkey").as("tag"))
      .as[(Long, Double, Long)]
    val topk = li.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(3).toColumn.name("top3"))
      .collect().toMap

    // cross-check one group against a window-based top-3
    val someKey = topk.keys.head
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey") === someKey)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      .limit(3)
      .select(col("l_extendedprice"), col("l_orderkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(topk(someKey) == expected)
    assert(topk.values.forall(_.size <= 3))
  }

  test("q5 plan degrades to shuffle joins when broadcast is disabled (scale-up simulation)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // drop the explicit nation/region hints by building the join raw
      val plan = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffle join without broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
