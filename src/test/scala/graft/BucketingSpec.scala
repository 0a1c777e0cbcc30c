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
}
