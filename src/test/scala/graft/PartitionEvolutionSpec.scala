package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PartitionEvolution, Scratch}

class PartitionEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  test("each era prunes by its own spec; union equals the plain scan") {
    val orders = Tables.orders(spark, sf)
    val cut = PartitionEvolution.cutMonth(orders)
    val path = Scratch.dir("part_evo_spec")
    PartitionEvolution.writeEvolved(orders, path, cut)
    val cutDay = java.time.LocalDate.parse(s"$cut-01")
    val (lo, hi) = (cutDay.minusDays(45).toString,
      cutDay.plusDays(44).toString)
    val pruned = PartitionEvolution.prunedRead(spark, path, lo, hi)
    // correctness: equals the plain filtered scan
    val got = pruned.count()
    val expected = orders
      .filter(to_date(col("o_orderdate")) >= lit(lo).cast("date") &&
        to_date(col("o_orderdate")) <= lit(hi).cast("date"))
      .count()
    assert(got == expected && got > 0)
    // partition pruning per era, read off the EXECUTED scans
    // (inputFiles reports the unpruned relation): PartitionCount in
    // each era's scan must equal the months/days intersecting the
    // window that actually exist in the data
    val loM = lo.substring(0, 7); val hiM = hi.substring(0, 7)
    def scanPartitionCounts(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.partitionCount
      }
    val monthlyScan = spark.read.parquet(s"$path/m")
      .filter(col("month_str") >= loM && col("month_str") <= hiM)
    val expectedMonths = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
      .filter(col("m") >= loM && col("m") <= hiM && col("m") < cut).count()
    assert(scanPartitionCounts(monthlyScan) == Seq(expectedMonths.toInt))
    val dailyScan = spark.read.parquet(s"$path/d")
      .filter(col("day_str") >= lo && col("day_str") <= hi)
    val expectedDays = orders
      .select(to_date(col("o_orderdate")).cast("string").as("ds"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
      .filter(col("ds") >= lo && col("ds") <= hi && col("m") >= cut).count()
    assert(scanPartitionCounts(dailyScan) == Seq(expectedDays.toInt))
  }
}
