package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located join path. At 100 TB the lineitem⋈orders
  * join is the dominant shuffle; pre-bucketing both tables on the join
  * key makes it exchange-free (each bucket pair joins locally).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free: both sides read bucketed
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side shuffled:\n$plan")

    // and the result matches the unbucketed join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }

  test("bucketed aggregation plans without any exchange") {
    val wh = Files.createTempDirectory("graft_buckets_agg").toString
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/o_ba").mode("overwrite").saveAsTable("o_ba")
    val agg = spark.table("o_ba")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed groupBy still shuffled:\n$plan")
    // values match the unbucketed rollup
    val expected = Tables.orders(spark, sf)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS o_ba")
  }

  test("dpp join injects a runtime partition filter into the fact scan") {
    val out = graft.sources.Dpp.dppPrunedRevenue(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(2000)}")
    // 1997H1 dim window ⇒ exactly the six 1997-01..1997-06 partitions
    val months = out.collect().map(_.getString(0)).toSet
    assert(months == Set("1997-01", "1997-02", "1997-03",
      "1997-04", "1997-05", "1997-06"))
  }
}
