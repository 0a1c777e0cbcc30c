package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LevenshteinGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // parquet-backed input: a local Seq would be constant-folded into a
  // LocalRelation at optimize time and leave no Filter to rewrite
  private def names = Tables.part(spark, sf)
    .select(lower(trim(col("p_name"))).as("name"))

  test("thresholded levenshtein filters gain a length guard, results unchanged") {
    val probe = "steel"
    val filtered = names.filter(levenshtein(col("name"), lit(probe)) <= 3)

    // the optimizer injected the cheap necessary condition
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length("),
      s"length guard missing from optimized plan:\n$opt")

    // and did not change semantics
    val got = filtered.collect().map(_.getString(0)).toSet
    val expected = names.collect().map(_.getString(0))
      .filter(n => editDist(n, probe) <= 3).toSet
    assert(got == expected)
    assert(expected == got)
  }

  test("guard is idempotent under the fixpoint optimizer") {
    val df = names.filter(levenshtein(col("name"), lit("zinc")) <= 1)
    val opt = df.queryExecution.optimizedPlan.toString
    // exactly one guard instance, not one per fixpoint iteration
    val occurrences = "abs\\(\\(length\\(".r.findAllIn(opt).length
    assert(occurrences == 1, s"expected 1 guard, plan:\n$opt")
  }
}
