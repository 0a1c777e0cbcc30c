package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.EventLog

/** The failure-notification surface (`alerts('<pipeline>')`) and the
  * ledger hygiene fixes that back it (r11 advice: tally-regex
  * anchoring, clear() releasing the eviction-order slot).
  */
class AlertsSpec extends AnyFunSuite {
  import TestSpark._

  test("alerts gate trips every severity exactly once, tally attached") {
    val rows = EventLog.queries("pipeline_alerts")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("severity")).toSeq ==
      Seq("recovered_retry", "failure", "skipped_upstream"))
    assert(rows.map(_.getAs[String]("table_name")).toSeq ==
      Seq("alrt_flaky", "alrt_broken", "alrt_rollup"))
    rows.foreach { r =>
      assert(r.getAs[Long]("run_ok") == 2L)
      assert(r.getAs[Long]("run_failed") == 1L)
      assert(r.getAs[Long]("run_skipped") == 1L)
    }
    // the flaky flow recovered on its second attempt
    val flaky = rows.find(_.getAs[String]("table_name") == "alrt_flaky").get
    assert(flaky.getAs[Int]("attempts") == 2 &&
      flaky.getAs[String]("status") == "ok")
    // clean run reachable through SQL too (TVF injected)
    assert(spark.sql("SELECT * FROM alerts('gate_alerts')").count() == 3)
  }

  test("tally parse is token-anchored: flows_ok never counts as ok") {
    val p = "alerts_spec_anchor"
    EventLog.clear(p)
    EventLog.record(p, "flow_progress", tableName = "t1", layer = "bronze",
      status = "failed", attempts = 2, message = "boom")
    // a Continuous-style completion message: flows_ok must NOT leak
    // into run_ok; absent keys read as 0
    EventLog.record(p, "run_completed",
      message = "flows_ok=2 exactly_once=true failed=1")
    val a = EventLog.alertsFor(p)
    assert(a.size == 1 && a.head.severity == "failure")
    assert(a.head.run_ok == 0L, s"flows_ok leaked: ${a.head}")
    assert(a.head.run_failed == 1L)
    EventLog.clear(p)
  }

  test("unknown pipeline errors loudly; clean run yields zero alerts") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM alerts('no_such_pipeline')").collect()
    }
    assert(e.getMessage.contains("no recorded events"))
    val p = "alerts_spec_clean"
    EventLog.clear(p)
    EventLog.record(p, "flow_progress", tableName = "t1", layer = "silver",
      status = "ok", attempts = 1)
    EventLog.record(p, "run_completed", message = "ok=1 failed=0 skipped=0")
    assert(EventLog.alertsFor(p).isEmpty)
    EventLog.clear(p)
  }

  test("clear() fully releases a pipeline: recreate does not duplicate") {
    val p = "alerts_spec_lifecycle"
    EventLog.clear(p)
    EventLog.record(p, "run_started", message = "tables=1")
    assert(EventLog.eventsFor(p).size == 1)
    EventLog.clear(p)
    assert(EventLog.eventsFor(p).isEmpty)
    // recreate after clear: events accumulate from scratch, once
    EventLog.record(p, "run_started", message = "tables=1")
    EventLog.record(p, "run_completed", message = "ok=1")
    assert(EventLog.eventsFor(p).map(_.event_type) ==
      Seq("run_started", "run_completed"))
    EventLog.clear(p)
  }
}
