package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Continuous

/** Continuous mode over the full medallion TOPOLOGY: one bronze change
  * log fanning out to two silver consumers plus an incremental gold
  * refresh, all always-on (the gate body self-asserts concurrency,
  * exactly-once restart, and per-layer convergence — this spec pins
  * the event story's structure so a silent flow-count regression
  * cannot masquerade as a pass).
  */
class ContinuousDagSpec extends AnyFunSuite {
  import TestSpark._

  test("pipeline_continuous_dag gate: pinned 24-row event story") {
    val rows = Continuous.queries("pipeline_continuous_dag")(spark, sf)
      .collect()
    assert(rows.length == 24)
    assert(rows.map(_.getAs[Long]("seq")).toSeq == (0L until 24L))
    val types = rows.map(_.getAs[String]("event_type")).toSeq
    assert(types.count(_ == "run_started") == 2)
    assert(types.count(_ == "flow_started") == 8) // 4 flows x 2 runs
    assert(types.count(_ == "flow_progress") == 12) // 3 drains x 4 flows
    assert(types.last == "run_completed")
    assert(rows.last.getAs[String]("message") ==
      "flows_ok=4 exactly_once=true")
    // gold metrics are cohort counts — bounded by the cohort modulus
    val goldMetrics = rows.filter(r =>
      r.getAs[String]("event_type") == "flow_progress" &&
        r.getAs[String]("table_name") == "gold_cohorts")
      .map(_.getAs[Long]("metric_value"))
    assert(goldMetrics.length == 3)
    assert(goldMetrics.forall(m => m > 0 && m <= 100))
    // live-row metrics are monotone per flow across the three drains
    Seq("bronze_events", "silver_events", "silver_users").foreach { f =>
      val ms = rows.filter(r =>
        r.getAs[String]("event_type") == "flow_progress" &&
          r.getAs[String]("table_name") == f)
        .map(_.getAs[Long]("metric_value"))
      assert(ms.length == 3 && ms.sameElements(ms.sorted),
        s"$f live-row drains not monotone: ${ms.mkString(",")}")
    }
  }
}
