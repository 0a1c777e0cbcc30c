package graft

import org.scalatest.funsuite.AnyFunSuite

/** Board-wide plan-regression lint (r15 verdict task 4): drives every
  * registered query at sf0.001 with checkpoint-hiding disabled and
  * asserts the scale invariants the round artifacts (PLANAUDIT_r*.txt)
  * have carried since r13 — zero cartesian products, zero
  * shuffled-hash joins, and sort-merge joins only at the adjudicated
  * sites in [[PlanAudit.SmjAllowed]]. A new SMJ (a broadcast hint that
  * stopped applying, a join that lost its equi-key) turns this suite
  * red in the pre-commit smoke instead of surfacing as a diff the next
  * judge has to forensically explain.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query's final plan holds the board " +
      "invariants: cartesian=0, shj=0, smj only on the allowlist") {
    val audits = PlanAudit.withCachingDisabled {
      SparkEntry.queries.keys.toSeq.sorted.map { q =>
        val a = PlanAudit.auditQuery(spark, sf, q)
        spark.catalog.clearCache()
        a
      }
    }
    val bad = audits.flatMap(PlanAudit.violations)
    assert(bad.isEmpty, "plan invariant violations:\n" +
      bad.mkString("  ", "\n  ", ""))
    // the lint must actually have walked the full board
    assert(audits.size == SparkEntry.queries.size)
  }

  test("the SMJ allowlist names only registered queries") {
    val ghost = PlanAudit.SmjAllowed.keySet -- SparkEntry.queries.keySet
    assert(ghost.isEmpty, s"allowlist entries without a query: $ghost")
  }
}
