package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

import graft.Tables

/** PIPELINE OBSERVABILITY AS SQL — the reference exposes every
  * pipeline's run/flow/quality events as a queryable relation
  * (`SELECT * FROM event_log(TABLE(olist_main_pipeline))` — ref
  * docs/DEPLOYMENT.md:192, docs/CDC_GUIDE.md:323, the DLT event log).
  * This is that surface for the engine's own orchestration: a
  * process-global append-only EVENT LEDGER that [[Pipeline]] writes
  * (run lifecycle + one `flow_progress` row per table, topo-ordered)
  * and the DQ surfaces write (`expectation` rows, one per rule), read
  * back through an injected `event_log('<pipeline>')` table-valued
  * function (the `table_changes` pattern —
  * [[graft.sources.CdfSql.tableChangesPlan]]).
  *
  * Scale: the ledger is METADATA-sized — O(tables + rules) rows per
  * run, never row-path data — so a LocalRelation is the right physical
  * shape (same class as SHOW-style commands); a shared-metastore
  * deployment would persist the same rows to a lake table instead.
  * `seq` is the event's position within ITS pipeline's ledger, so the
  * relation is deterministically ordered however many pipelines share
  * the process.
  */
object EventLog {

  /** One observable pipeline event. Flow rows carry status/attempts/
    * message; expectation rows carry metric_name (the rule) and
    * metric_value (its violation count).
    */
  final case class Event(
      pipeline: String,
      seq: Long,
      event_type: String,
      table_name: String,
      layer: String,
      status: String,
      attempts: Int,
      message: String,
      metric_name: String,
      metric_value: Long)

  // Process-global, ONE bounded deque per pipeline (the builtin-
  // registry discipline: sessions share it). Per-pipeline storage
  // keeps append O(1) — the previous single CopyOnWriteArrayList paid
  // an O(total) array copy per append — and makes retention natural:
  // a long-lived process running many transactions (each `txn:<group>`
  // is its own pipeline name) can never grow the ledger without bound.
  private val MaxEventsPerPipeline = 10000
  private val MaxPipelines = 512
  private val ledger = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.LinkedBlockingDeque[Event]]()
  // insertion order of pipeline names, for oldest-first eviction
  private val pipelineOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Append one event; `seq` is assigned at read time (position within
    * the pipeline's own ledger), so callers never coordinate. Retention:
    * oldest events beyond [[MaxEventsPerPipeline]] drop per pipeline,
    * and the oldest PIPELINES beyond [[MaxPipelines]] drop entirely —
    * observability is a window, not an archive (a shared-metastore
    * deployment would persist the full history to a lake table).
    */
  def record(pipeline: String, eventType: String, tableName: String = "",
      layer: String = "", status: String = "", attempts: Int = 0,
      message: String = "", metricName: String = "",
      metricValue: Long = 0L): Unit = {
    val ev = Event(pipeline, -1L, eventType, tableName, layer, status,
      attempts, message, metricName, metricValue)
    // Append-then-verify: between computeIfAbsent and add, a concurrent
    // eviction / clear() / replaceExpectations() can detach the deque —
    // an event appended to an orphan would be silently lost. If the map
    // no longer holds OUR deque after the add, retry against the live
    // one (bounded: churn on one pipeline name is gate-scoped).
    var appended = false
    while (!appended) {
      val q = ledger.computeIfAbsent(pipeline, p => {
        pipelineOrder.add(p)
        new java.util.concurrent.LinkedBlockingDeque[Event]()
      })
      q.add(ev)
      if (ledger.get(pipeline) eq q) {
        appended = true
        while (q.size > MaxEventsPerPipeline) q.pollFirst()
      }
    }
    evictBeyondCap(active = pipeline)
  }

  /** Oldest-first pipeline eviction, shared by every ledger mutation
    * that can grow the map. Names popped from [[pipelineOrder]] that no
    * longer exist in the ledger (cleared gates) are simply discarded —
    * they must not count against, or trigger, eviction of live entries.
    */
  private def evictBeyondCap(active: String): Unit = {
    while (ledger.size > MaxPipelines) {
      val oldest = pipelineOrder.poll()
      if (oldest == null) return
      if (oldest == active) pipelineOrder.add(oldest) // never the writer
      else ledger.remove(oldest)
    }
  }

  /** One `expectation` event per rule — the DQ-monitor rollup shape
    * (`flow_progress.data_quality` in the reference's event log).
    */
  def recordExpectations(pipeline: String, tableName: String,
      metrics: Seq[(String, Long)]): Unit =
    metrics.foreach { case (rule, violations) =>
      record(pipeline, "expectation", tableName = tableName,
        status = "warn", metricName = rule, metricValue = violations)
    }

  /** ATOMICALLY replace a pipeline's ledger with one `expectation` row
    * per rule — a single map swap, so a concurrent reader (or a second
    * run of the same monitor) sees either run's COMPLETE event set,
    * never a clear/record interleaving.
    */
  def replaceExpectations(pipeline: String, tableName: String,
      metrics: Seq[(String, Long)]): Unit = {
    val q = new java.util.concurrent.LinkedBlockingDeque[Event]()
    metrics.foreach { case (rule, violations) =>
      q.add(Event(pipeline, -1L, "expectation", tableName, "", "warn",
        0, "", rule, violations))
    }
    if (ledger.put(pipeline, q) == null) pipelineOrder.add(pipeline)
    evictBeyondCap(active = pipeline)
  }

  /** Drop a pipeline's events — gates clear before a scripted run so
    * re-runs in one process stay deterministic, and transaction gates
    * clear their random `txn:<group>` name when done so gate churn
    * never consumes retention budget.
    */
  def clear(pipeline: String): Unit = {
    ledger.remove(pipeline)
    // also release the name's eviction-order slot: every random
    // `txn:<group>` gate run would otherwise leak a string into
    // pipelineOrder forever, and a cleared-then-recreated pipeline
    // would hold DUPLICATE order entries — evicted prematurely the
    // moment the cap is hit.
    pipelineOrder.remove(pipeline)
  }

  /** The pipeline's events in recorded order, seq assigned. */
  def eventsFor(pipeline: String): Seq[Event] = {
    val q = ledger.get(pipeline)
    if (q == null) Seq.empty
    else q.iterator().asScala.zipWithIndex
      .map { case (e, i) => e.copy(seq = i.toLong) }.toSeq
  }

  /** Builder for the `event_log('<pipeline>')` table-valued function
    * (injected via `injectTableFunction`, resolved on the driver during
    * analysis like `table_changes`). Errors loudly on an unknown
    * pipeline — an empty observability read is a misconfiguration, not
    * an empty result.
    */
  def eventLogPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1,
      s"event_log(pipeline) takes 1 argument, got ${args.size}")
    val name = args.head match {
      case Literal(v, _) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"event_log pipeline name must be a non-null literal, got $other")
    }
    val evs = eventsFor(name)
    require(evs.nonEmpty, s"no recorded events for pipeline '$name' " +
      "(known: " + ledger.keySet().asScala.toSeq.sorted.mkString(", ")
      + ")")
    SparkSession.active.createDataFrame(evs).queryExecution.analyzed
  }

  // ---- alerts --------------------------------------------------------------

  /** One actionable alert derived from a run's ledger — the queryable
    * half of the reference's `email_notifications.on_failure` (ref
    * resources/olist_jobs.yml:50-53): the reference pages a mailbox;
    * this engine derives the same incidents as ROWS a monitor can poll,
    * join, or forward. Severities: `failure` (a flow exhausted its
    * retries), `skipped_upstream` (a downstream flow never ran because
    * its dependency failed), `recovered_retry` (the flow landed, but
    * only after retrying — the flakiness signal a healthy-looking run
    * would otherwise hide). Each alert carries the run's final tally so
    * the receiver can judge blast radius without a second query.
    */
  final case class Alert(
      pipeline: String,
      alert_seq: Long,
      severity: String,
      table_name: String,
      layer: String,
      status: String,
      attempts: Int,
      error: String,
      run_ok: Long,
      run_failed: Long,
      run_skipped: Long)

  /** Alerts for a pipeline's recorded run: every `flow_progress` row
    * that should page (failed), warn (skipped downstream), or annotate
    * (ok after retries), in ledger order, stamped with the
    * `run_completed` tally.
    */
  def alertsFor(pipeline: String): Seq[Alert] = {
    val evs = eventsFor(pipeline)
    val tally = evs.filter(_.event_type == "run_completed")
      .lastOption.map(_.message).getOrElse("")
    // token-anchored: a bare "ok=(\d+)" would also match inside
    // "flows_ok=2" (Continuous's completion message) and miscount
    def t(k: String): Long =
      s"(?<![A-Za-z0-9_])$k=(\\d+)".r.findFirstMatchIn(tally)
        .map(_.group(1).toLong).getOrElse(0L)
    evs.filter(_.event_type == "flow_progress")
      .filter(e => e.status == "failed" || e.status == "skipped" ||
        (e.status == "ok" && e.attempts > 1))
      .zipWithIndex.map { case (e, i) =>
        Alert(pipeline, i.toLong,
          e.status match {
            case "failed" => "failure"
            case "skipped" => "skipped_upstream"
            case _ => "recovered_retry"
          },
          e.table_name, e.layer, e.status, e.attempts, e.message,
          t("ok"), t("failed"), t("skipped"))
      }
  }

  /** Builder for the `alerts('<pipeline>')` table-valued function.
    * Unknown pipeline errors loudly (same rule as [[eventLogPlan]]);
    * a known pipeline with a CLEAN run yields zero rows — that is the
    * healthy answer, not an error.
    */
  def alertsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1,
      s"alerts(pipeline) takes 1 argument, got ${args.size}")
    val name = args.head match {
      case Literal(v, _) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"alerts pipeline name must be a non-null literal, got $other")
    }
    require(eventsFor(name).nonEmpty,
      s"no recorded events for pipeline '$name' " +
        "(known: " + ledger.keySet().asScala.toSeq.sorted.mkString(", ")
        + ")")
    SparkSession.active.createDataFrame(alertsFor(name))
      .queryExecution.analyzed
  }

  // ---- gate ----------------------------------------------------------------

  /** `pipeline_event_log` — the observability surface over a SCRIPTED
    * DAG run, read back entirely through SQL:
    *
    *  1. a five-table DAG (two real silver tables landing to a scratch
    *     lake, a gold rollup, a node that fails deterministically with
    *     one retry, and its downstream — skipped) runs under
    *     `continueOnFailure` with the ledger attached
    *     (`RunPolicy.pipelineName`);
    *  2. the DQ rules ([[graft.streaming.DqMonitor.rules]]) are rolled
    *     up over the raw events feed — the same batch-boundary-
    *     independent numbers the streaming monitor accumulates — and
    *     recorded as `expectation` events;
    *  3. `SELECT * FROM event_log('…')` serves the whole story as
    *     ordered rows: run_started → flow_progress per table in topo
    *     order (ok ×3 / failed with attempts=2 / skipped with the
    *     upstream named) → run_completed with the status tally →
    *     expectations with oracle-recomputable violation counts.
    *
    * Every row is deterministic: statuses and messages are pinned by
    * the script, violation counts recompute in SQL from the raw feed.
    */
  def eventLogGate(spark: SparkSession, sfDir: String): DataFrame = {
    import Pipeline.{RunPolicy, TableDef}
    import graft.operators.Medallion
    val name = "gate_evlog"
    clear(name)
    val lake = graft.sources.Scratch.dir("evlog_lake")
    val defs = Seq(
      TableDef("silver_orders", "silver", Nil,
        (s, _) => Medallion.silverOrders(Tables.orders(s, sfDir)),
        sources = Seq(s"$sfDir/orders.parquet")),
      TableDef("silver_lineitem", "silver", Nil,
        (s, _) => Medallion.silverLineitem(Tables.lineitem(s, sfDir)),
        sources = Seq(s"$sfDir/lineitem.parquet")),
      TableDef("broken_feed", "silver", Nil,
        (_, _) => sys.error("synthetic failure: upstream unavailable"),
        sources = Seq(s"$sfDir/events.parquet")),
      TableDef("gold_order_volume", "gold", Seq("silver_orders"),
        (_, t) => t("silver_orders").groupBy(col("order_status"))
          .agg(count(lit(1)).as("n_orders"))),
      TableDef("gold_broken_rollup", "gold", Seq("broken_feed"),
        (_, t) => t("broken_feed")))
    Pipeline.runWithReport(spark, defs, lakeDir = Some(lake),
      policy = RunPolicy(maxRetries = 1, continueOnFailure = true,
        pipelineName = Some(name)))
    // the DQ rollup, one aggregate pass (identical numbers to the
    // streaming monitor's accumulation — batch-boundary-independent)
    val rules = graft.streaming.DqMonitor.rules
    val aggs = rules.map(r =>
      sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L))
        .as(r.name))
    val row = Tables.events(spark, sfDir)
      .filter(col("event_id").isNotNull)
      .agg(aggs.head, aggs.tail: _*).head()
    recordExpectations(name, "bronze_events",
      rules.map(r => r.name -> row.getAs[Long](r.name)).sortBy(_._1))
    spark.sql(s"SELECT * FROM event_log('$name')")
  }

  val eventLogGateSql: String =
    """WITH flows AS (
         SELECT * FROM (VALUES
           (0, 'run_started', '', '', '', 0, 'tables=5', '', 0),
           (1, 'flow_progress', 'silver_orders', 'silver', 'ok', 1, '', '', 0),
           (2, 'flow_progress', 'silver_lineitem', 'silver', 'ok', 1, '', '', 0),
           (3, 'flow_progress', 'broken_feed', 'silver', 'failed', 2,
            'java.lang.RuntimeException: synthetic failure: upstream unavailable', '', 0),
           (4, 'flow_progress', 'gold_order_volume', 'gold', 'ok', 1, '', '', 0),
           (5, 'flow_progress', 'gold_broken_rollup', 'gold', 'skipped', 0,
            'upstream failed: broken_feed', '', 0),
           (6, 'run_completed', '', '', '', 0,
            'ok=3 failed=1 skipped=1 fresh=0', '', 0)
         ) AS t(seq, event_type, table_name, layer, status, attempts,
                message, metric_name, metric_value)),
       e AS (SELECT user_id, event_type, value FROM events
             WHERE event_id IS NOT NULL),
       dq AS (
         SELECT * FROM (
           SELECT 7 AS seq, 'event_type_present' AS metric_name,
             CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS metric_value FROM e
           UNION ALL
           SELECT 8, 'user_present',
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) FROM e
           UNION ALL
           SELECT 9, 'value_nonneg',
             CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
               AS BIGINT) FROM e))
       SELECT 'gate_evlog' AS pipeline, CAST(seq AS BIGINT) AS seq,
         event_type, table_name, layer, status, attempts, message,
         metric_name, metric_value
       FROM flows
       UNION ALL
       SELECT 'gate_evlog', CAST(seq AS BIGINT), 'expectation',
         'bronze_events', '', 'warn', 0, '', metric_name, metric_value
       FROM dq
       ORDER BY seq"""

  /** `pipeline_alerts` — the failure-notification surface proven over a
    * scripted run that trips every severity exactly once:
    *
    *  1. a four-table DAG runs under `continueOnFailure` with the
    *     ledger attached: one clean table, one FLAKY table (fails its
    *     first attempt, lands on the retry — the signal a
    *     healthy-looking run hides), one deterministic permanent
    *     failure, and its downstream (skipped);
    *  2. `SELECT * FROM alerts('…')` derives the pageable incidents in
    *     ledger order — `recovered_retry`, `failure`,
    *     `skipped_upstream` — each stamped with the run's final tally
    *     (ok=2 failed=1 skipped=1) so a receiver can judge blast radius
    *     without a second query; the clean table produces NO row.
    *
    * Every value is pinned by the script: statuses, attempt counts,
    * error strings, and tallies are deterministic, so the oracle is a
    * literal VALUES relation.
    */
  def alertsGate(spark: SparkSession, sfDir: String): DataFrame = {
    import Pipeline.{RunPolicy, TableDef}
    import graft.operators.Medallion
    val name = "gate_alerts"
    clear(name)
    // first attempt throws, the retry succeeds — deterministic within
    // the run because the counter is scoped to this gate invocation
    val flakyTries = new java.util.concurrent.atomic.AtomicInteger(0)
    val defs = Seq(
      TableDef("alrt_orders", "silver", Nil,
        (s, _) => Medallion.silverOrders(Tables.orders(s, sfDir))),
      TableDef("alrt_flaky", "silver", Nil,
        (s, _) => {
          if (flakyTries.getAndIncrement() == 0)
            sys.error("synthetic failure: transient")
          Medallion.silverOrders(Tables.orders(s, sfDir))
        }),
      TableDef("alrt_broken", "silver", Nil,
        (_, _) => sys.error("synthetic failure: permanent")),
      TableDef("alrt_rollup", "gold", Seq("alrt_broken"),
        (_, t) => t("alrt_broken")))
    Pipeline.runWithReport(spark, defs,
      policy = RunPolicy(maxRetries = 1, continueOnFailure = true,
        pipelineName = Some(name)))
    spark.sql(s"SELECT * FROM alerts('$name')")
  }

  val alertsGateSql: String =
    """SELECT * FROM (VALUES
         ('gate_alerts', CAST(0 AS BIGINT), 'recovered_retry',
          'alrt_flaky', 'silver', 'ok', 2, '',
          CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
         ('gate_alerts', 1, 'failure', 'alrt_broken', 'silver', 'failed',
          2, 'java.lang.RuntimeException: synthetic failure: permanent',
          2, 1, 1),
         ('gate_alerts', 2, 'skipped_upstream', 'alrt_rollup', 'gold',
          'skipped', 0, 'upstream failed: alrt_broken', 2, 1, 1)
       ) AS t(pipeline, alert_seq, severity, table_name, layer, status,
              attempts, error, run_ok, run_failed, run_skipped)
       ORDER BY alert_seq"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_event_log" -> ((s, d) =>
      eventLogGate(s, d).orderBy(col("seq"))),
    "pipeline_alerts" -> ((s, d) =>
      alertsGate(s, d).orderBy(col("alert_seq"))))

  def oracles: Map[String, String] = Map(
    "pipeline_event_log" -> eventLogGateSql,
    "pipeline_alerts" -> alertsGateSql)
}
