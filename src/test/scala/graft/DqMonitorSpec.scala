package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct spec for the streaming DQ monitor — r11 shipped a refactor
  * that only CoreSpec's all-queries smoke caught (collected
  * `feed_bucket` read as Long while the declared stream schema pins it
  * IntegerType → ClassCastException on every run). This pins the
  * operator's own contract so the failure mode has a named test.
  */
class DqMonitorSpec extends AnyFunSuite {
  import TestSpark._

  test("monitor runs, emits per-(bucket, rule) grain with long types") {
    val out = streaming.DqMonitor.queries("stream_dq_monitor")(spark, sf)
    val rows = out.collect()
    val ruleNames = streaming.DqMonitor.rules.map(_.name).toSet
    // 3 feed buckets x every rule, exactly once each
    assert(rows.length == 3 * ruleNames.size)
    assert(rows.map(r => (r.getAs[Long]("feed_bucket"),
      r.getAs[String]("rule_name"))).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("feed_bucket")).toSet == Set(0L, 1L, 2L))
    assert(rows.map(_.getAs[String]("rule_name")).toSet == ruleNames)
    // schema really is long-typed (the r11 regression was a type drift)
    val sch = out.schema
    assert(sch("feed_bucket").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(sch("n_violations").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("accumulated violation counts equal the one-shot batch recompute") {
    val out = streaming.DqMonitor.queries("stream_dq_monitor")(spark, sf)
      .groupBy(col("rule_name"))
      .agg(sum(col("n_violations")).as("v"), sum(col("n_rows")).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val ev = Tables.events(spark, sf).filter(col("event_id").isNotNull)
    val total = ev.count()
    streaming.DqMonitor.rules.foreach { r =>
      val expected = ev.filter(!coalesce(r.predicate, lit(false))).count()
      val (v, n) = out(r.name)
      assert(v == expected, s"${r.name}: monitor=$v batch=$expected")
      assert(n == total, s"${r.name}: n_rows=$n != $total")
    }
  }

  test("monitor publishes its rollup to the event_log ledger") {
    streaming.DqMonitor.queries("stream_dq_monitor")(spark, sf).count()
    val evs = plans.EventLog.eventsFor("stream_dq_monitor")
    assert(evs.nonEmpty && evs.forall(_.event_type == "expectation"))
    assert(evs.map(_.metric_name).sorted ==
      streaming.DqMonitor.rules.map(_.name).sorted)
  }
}
