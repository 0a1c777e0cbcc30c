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

  test("unpushable filters stay as residual and results are exact") {
    // cat predicate cannot prune partitions — it must survive as a
    // Spark Filter and still evaluate correctly over generated rows
    val df = load(1000, 4).filter(col("cat") === "c0")
    val expected = (1L to 1000L).count(id => GenSource.catOf(id) == "c0")
    assert(df.count() == expected)
    assert(df.rdd.getNumPartitions == 4) // nothing pruned
  }
}
