package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage inventory the driver and judge audit
  * against; SparkEntry.queries is the registry the gate actually runs.
  * r5 shipped two operators that were registered and green but absent
  * from §2 — inventory drift that silently corrupts coverage
  * accounting. This spec makes the two sets EQUAL, so adding an
  * operator without documenting it (or documenting one without
  * registering it) is a test failure, not a judge finding.
  */
class SurveyInventorySpec extends AnyFunSuite {

  private val NameCell = """^\|\s*`([a-z0-9_]+)`\s*\|""".r

  test("SURVEY §2 operator names == SparkEntry.queries keys") {
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("SURVEY.md")).asScala
    val section2 = lines
      .dropWhile(!_.startsWith("## §2"))
      .takeWhile(l => !l.startsWith("## §3"))
    val documented = section2.flatMap {
      l => NameCell.findFirstMatchIn(l).map(_.group(1))
    }.toSet
    val registered = SparkEntry.queries.keySet
    val undocumented = registered.diff(documented)
    val unregistered = documented.diff(registered)
    assert(undocumented.isEmpty,
      s"registered but missing from SURVEY §2: ${undocumented.toSeq.sorted}")
    assert(unregistered.isEmpty,
      s"in SURVEY §2 but not registered: ${unregistered.toSeq.sorted}")
    // every registered query must also carry an oracle or be a
    // documented rows-only check; today ALL queries have oracles —
    // keep it that way
    val noOracle = registered.diff(SparkEntry.oracleSql.keySet)
    assert(noOracle.isEmpty,
      s"queries without a DuckDB oracle: ${noOracle.toSeq.sorted}")
  }

  test("benchQueries covers exactly the queries keys") {
    // Bench runs benchQueries (honesty-assertion-free overrides where
    // the assertion computes an exact baseline); a bench registry that
    // gained or lost a name vs the correctness registry would silently
    // desync BENCH_* from CORRECTNESS_* rows.
    assert(SparkEntry.benchQueries.keySet == SparkEntry.queries.keySet)
    // overrides must stay rare and deliberate — each one is a gate
    // whose Verify path pays an exact-baseline honesty check
    assert(SparkEntry.benchOverrides.keySet == Set("ann_hybrid_rrf_routed"),
      s"unexpected bench overrides: ${SparkEntry.benchOverrides.keySet}")
    assert(SparkEntry.benchOverrides.keySet
      .subsetOf(SparkEntry.queries.keySet))
  }

  test("registry iteration order is pinned (sorted by name)") {
    // Verify/Bench/PlanAudit execute gates in registry iteration order;
    // an unordered Map makes that order an unbisectable degree of
    // freedom when diagnosing shared-session interference (r10 verdict
    // task 8). The registry must iterate name-sorted, every time.
    val keys = SparkEntry.queries.keys.toSeq
    assert(keys == keys.sorted,
      "SparkEntry.queries must iterate in sorted-name order")
  }
}
