package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GenSource

class GenSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def load(rows: Long, parts: Int) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  // the executed plan with the AQE wrapper unwrapped (aggregates plan
  // adaptively; the scan lives in the adaptive sub-plan)
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("short name resolves and values match the generator function") {
    val rows = load(100, 4).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == GenSource.keyOf(id))
      assert(r.getString(2) == GenSource.catOf(id))
    }
  }

  test("pushed id range prunes whole partitions at plan time") {
    // 1000 rows over 8 partitions of 125 ids; id <= 250 covers exactly 2
    val df = load(1000, 8).filter(col("id") <= 250L)
    assert(df.rdd.getNumPartitions == 2,
      s"expected 2 surviving partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 250)
    // the accepted filter is reported as pushed, and no residual
    // Spark-side Filter remains for it
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.toString.contains("graftgen"),
      s"not the V2 scan: $scan")
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("Filter ("),
      s"pushed predicate still filtered post-scan:\n$planStr")
  }

  test("column pruning reaches the reader schema") {
    val df = load(1000, 4).select(col("id"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.sameElements(Array("id")),
      s"reader schema not pruned: ${scan.scan.readSchema()}")
    assert(df.agg(sum(col("id"))).head.getLong(0) == 1000L * 1001 / 2)
  }

  test("grouped aggregate pushdown: readers aggregate, Spark merges partials") {
    val df = load(100000, 16)
      .filter(col("id") >= 10000L && col("id") <= 90000L)
      .groupBy(col("cat"))
      .agg(count(col("id")).as("n"), sum(col("k")).as("sum_k"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // ground truth straight from the generator function
    val ids = 10000L to 90000L
    val want = ids.groupBy(GenSource.catOf).map { case (c, g) =>
      c -> (g.size.toLong, g.map(GenSource.keyOf).sum, g.min, g.max)
    }
    assert(got == want)
    // AQE hides the scan inside query stages; the tree STRING still
    // prints every stage subtree, scan description included
    val plan = finalPlan(df).toString
    assert(plan.contains("pushedAggregation"),
      s"aggregate not pushed:\n$plan")
    assert(plan.contains("mode=partial"), plan)
    // the ROW-LEVEL aggregation moved into the scan: Spark's aggregate
    // consumes the scan's pushed partial columns (sum-of-counts etc.
    // over ≤5 rows per partition), never the raw id/k rows
    assert(plan.contains("partial_sum(agg_func"),
      s"Spark-side aggregate not rewritten onto pushed partials:\n$plan")
    assert(!plan.contains("partial_count("),
      s"raw-row count survived pushdown:\n$plan")
  }

  test("ungrouped closed-form aggregate: complete pushdown, no agg node") {
    val df = load(100000, 16)
      .filter(col("id") >= 2500L && col("id") <= 7500L)
      .agg(count(col("id")).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5001L, 2500L, 7500L))
    val plan = finalPlan(df).toString
    assert(plan.contains("mode=complete"), s"not complete-pushed:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown still aggregates Spark-side:\n$plan")
  }

  test("sum disqualifies complete pushdown but still pushes partials") {
    val df = load(1000, 4).agg(sum(col("k")).as("sum_k"))
    val want = (1L to 1000L).map(GenSource.keyOf).sum
    assert(df.collect().head.getLong(0) == want)
    val plan = finalPlan(df).toString
    assert(plan.contains("mode=partial"), plan)
  }

  test("unpushable filters stay as residual and results are exact") {
    // cat predicate cannot prune partitions — it must survive as a
    // Spark Filter and still evaluate correctly over generated rows
    val df = load(1000, 4).filter(col("cat") === "c0")
    val expected = (1L to 1000L).count(id => GenSource.catOf(id) == "c0")
    assert(df.count() == expected)
    assert(df.rdd.getNumPartitions == 4) // nothing pruned
  }
}
