package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ConfigLint
import graft.plans.ConfigLint.{SpecJob, SpecTable}

class ConfigLintSpec extends AnyFunSuite {
  import TestSpark._

  private def findings(tables: Seq[SpecTable],
      jobs: Seq[SpecJob]): Set[(String, String)] =
    ConfigLint.lint(spark, tables, jobs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("the real medallion DAG and real jobs lint clean") {
    assert(findings(ConfigLint.realTables(sf), ConfigLint.realJobs).isEmpty)
  }

  test("each broken fixture row trips exactly its rule") {
    val got = findings(
      ConfigLint.realTables(sf) ++ ConfigLint.brokenTables,
      ConfigLint.realJobs ++ ConfigLint.brokenJobs)
    val expected = Set(
      ("duplicate_name", "bad_dup"),
      ("unknown_dep", "bad_unknown"),
      ("self_dep", "bad_self"),
      ("dependency_cycle", "bad_cyc_a"),
      ("dependency_cycle", "bad_cyc_b"),
      ("layer_inversion", "bad_layer"),
      ("no_input", "bad_island"),
      ("cron_syntax", "bad_cron_job"),
      ("job_unknown_table", "bad_target_job"))
    assert(got == expected)
  }

  test("cycle detection: length-1 loops are self_dep, not cycles") {
    assert(ConfigLint.cycleNodes(Seq(
      SpecTable("a", "silver", Seq("a"), hasSources = true))) == Nil)
    assert(ConfigLint.cycleNodes(Seq(
      SpecTable("a", "silver", Seq("b"), hasSources = true),
      SpecTable("b", "silver", Seq("c"), hasSources = true),
      SpecTable("c", "silver", Seq("a"), hasSources = true),
      SpecTable("d", "silver", Seq("a"), hasSources = true))) ==
      Seq("a", "b", "c"))
  }
}
