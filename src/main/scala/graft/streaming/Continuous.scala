package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.plans.EventLog
import graft.sources.{Scratch, VersionedLake}

/** CONTINUOUS-MODE PIPELINE EXECUTION — the reference's
  * `continuous: false` pipeline flag flipped ON (ref
  * resources/olist_pipeline.yml:24): instead of the triggered-batch
  * [[graft.plans.Pipeline]] runner (build each table once, in topo
  * order, then exit), every flow of the DAG runs as an ALWAYS-ON
  * Structured Streaming query, all active at the same time, each
  * landing microbatches into its lake table as upstream data arrives —
  * DLT's continuous pipelines, re-expressed as one StreamingQuery per
  * flow over the [[VersionedLake]] connectors.
  *
  * Semantics carried over from the triggered runner:
  *  - **exactly-once per flow**: each microbatch lands through
  *    [[VersionedLake.upsertTxn]] keyed (appId = pipeline/flow,
  *    txnVersion = batchId), so a crash/restart replay of a committed
  *    batch is an idempotent skip — the streaming file-source
  *    checkpoint plus the transaction watermark cover both halves of
  *    the contract;
  *  - **observability**: the run writes the same [[EventLog]] surface
  *    as triggered runs (`run_started` / `flow_started` per flow in
  *    DAG order / `flow_progress` with a deterministic metric /
  *    `run_stopped` / `run_completed`), so
  *    `SELECT * FROM event_log('<pipeline>')` serves a continuous run
  *    the way it serves a batch one;
  *  - **restart = resume**: a new [[Runner]] over the same checkpoints
  *    continues each flow from its sealed offsets — only data that
  *    arrived since the stop is processed (proven by the gate's
  *    per-run row counters).
  *
  * At 100 TB: per-flow progress metrics here are read from in-process
  * counters because the gate needs exact, oracle-recomputable numbers;
  * a production deployment would read the same numbers from each
  * query's `StreamingQueryProgress.numInputRows` (no extra pass). The
  * flows themselves shuffle only inside their own microbatch merges —
  * the always-on topology adds no cross-flow shuffles; change files
  * hard-link, so the bronze→silver edge moves metadata, not data.
  */
object Continuous {

  /** One always-on flow: a streaming source (file feed or an upstream
    * table's change log) merged into `target` under the flow's own
    * (key, sequence) contract.
    */
  final case class FlowDef(
      name: String,
      layer: String,
      source: SparkSession => DataFrame,
      target: String,
      keyCols: Seq[String],
      seqCol: String,
      transform: DataFrame => DataFrame = identity,
      /** Custom microbatch applier for flows that are NOT keyed merges
        * of their input — e.g. an incremental GOLD refresh that
        * recomputes affected groups from upstream live state. Receives
        * (session, transformed batch, batchId); owns its own
        * exactly-once discipline (normally [[VersionedLake.upsertTxn]]
        * keyed on the batchId). When set, `keyCols`/`seqCol` are
        * documentation only.
        */
      applyBatch: Option[(SparkSession, DataFrame, Long) => Unit] = None)

  /** One continuous run: all flows started (and active) together,
    * drained on demand, stopped gracefully. A second Runner over the
    * same checkpoints resumes.
    */
  final class Runner(spark: SparkSession, pipeline: String,
      flows: Seq[FlowDef], checkpointRoot: String, resume: Boolean) {

    private val counters = flows.map(f =>
      f.name -> new java.util.concurrent.atomic.AtomicLong()).toMap
    private var queries: Seq[(FlowDef, StreamingQuery)] = Nil

    def start(): this.type = {
      EventLog.record(pipeline, "run_started",
        message = s"flows=${flows.size} resume=$resume")
      queries = flows.map { f =>
        val q = f.transform(f.source(spark)).writeStream
          .option("checkpointLocation", s"$checkpointRoot/${f.name}")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // count + land: the foreachBatch relation is a small
            // microbatch; production would read numInputRows instead
            val n = batch.count()
            if (n > 0) {
              f.applyBatch match {
                case Some(apply) => apply(spark, batch, id)
                case None => VersionedLake.upsertTxn(spark, f.target,
                  batch, f.keyCols, f.seqCol, s"$pipeline/${f.name}", id)
              }
              counters(f.name).addAndGet(n)
            }
            ()
          }
          .start() // default trigger: always-on microbatches
        EventLog.record(pipeline, "flow_started", f.name, f.layer,
          status = "running")
        f -> q
      }
      this
    }

    /** All flows active at once — the property that distinguishes
      * continuous mode from the topo-ordered triggered runner.
      */
    def allActive: Boolean = queries.nonEmpty && queries.forall(_._2.isActive)

    /** Block until every flow has consumed everything currently
      * available, in DAG order (upstream first, so a downstream flow's
      * drain observes the upstream commits this drain produced), then
      * record one `flow_progress` row per flow with its target's LIVE
      * row count — the convergence witness, deterministic for every
      * flow (rows-PROCESSED would not be: a COW upstream's change log
      * legitimately re-delivers whole touched buckets, so a downstream
      * flow's input cardinality depends on bucket hashing; per-run
      * processed counts stay available via [[rowsThisRun]] for callers
      * that know their flow's input is deterministic, e.g. the gate's
      * exactly-once assertion on the root feed).
      */
    def drain(): this.type = {
      queries.foreach { case (f, q) =>
        q.processAllAvailable()
        EventLog.record(pipeline, "flow_progress", f.name, f.layer,
          status = "ok", metricName = "live_rows",
          metricValue = VersionedLake.read(spark, f.target).count())
      }
      this
    }

    def rowsThisRun(flow: String): Long = counters(flow).get

    def stop(eventType: String, message: String): Unit = {
      queries.foreach(_._2.stop())
      queries.foreach(_._2.awaitTermination())
      EventLog.record(pipeline, eventType, message = message)
    }
  }

  // ---- gate ----------------------------------------------------------------

  /** `pipeline_continuous` — the always-on medallion DAG, proven in one
    * scripted pass with a mid-run restart:
    *
    *  1. a 2-flow DAG (bronze: CDC feed files → lake table; silver:
    *     bronze's change log → `value_band` transform → lake table)
    *     starts; BOTH queries are concurrently active (asserted);
    *  2. feed third A arrives → drain → flow_progress rows carry each
    *     flow's live-row count (= A's live SCD1 winners, both layers);
    *     third B arrives WHILE THE QUERIES RUN (the continuous part) →
    *     drain again → counts advance to the ≤t2 state;
    *  3. graceful stop; third C arrives while the pipeline is DOWN;
    *  4. a resumed run over the same checkpoints processes EXACTLY |C|
    *     feed rows (bronze per-run counter — a batch-A/B replay would
    *     inflate it; flip is a loud error and the pinned
    *     `exactly_once=true` completion message), converging silver to
    *     the full-feed SCD1 state (asserted against the batch
    *     recompute, column-for-column).
    *
    * The gate emits the run's ORDERED EVENT ROWS; every metric value is
    * recomputed by the DuckDB oracle from the raw feed at the same
    * sequence thresholds.
    */
  def continuousGate(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val pipeline = "gate_continuous"
    EventLog.clear(pipeline)
    val feed = Scratch.dir("cont_feed")
    val bronze = Scratch.dir("cont_bronze")
    val silver = Scratch.dir("cont_silver")
    val ckpt = Files.createTempDirectory("graft_cont_ckpt").toString

    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, dir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    val changes = asChanges(staged)
    def arrive(lo: Long, hi: Long): Long = {
      val part = changes.filter(col("sequence_number") > lo &&
        col("sequence_number") <= hi)
      part.repartition(1).write.mode("append").parquet(feed)
      part.count()
    }
    val feedSchema = changes.schema
    // the silver stream's change-log glob must have a listable parent
    // before bronze's first commit creates it (flow start is concurrent)
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(s"$bronze/_changes"))

    val flows = Seq(
      FlowDef("bronze_events", "bronze",
        s => s.readStream.schema(feedSchema).parquet(feed),
        bronze, Seq("key_id"), "sequence_number"),
      FlowDef("silver_events", "silver",
        s => VersionedLake.streamSource(s, bronze, feedSchema),
        silver, Seq("key_id"), "sequence_number",
        transform = _.withColumn("value_band", floor(col("value")))))

    // run 1: A arrives, both flows start, B arrives while running
    val nA = arrive(Long.MinValue, t1)
    val run1 = new Runner(spark, pipeline, flows, ckpt, resume = false)
      .start()
    val concurrent1 = run1.allActive
    run1.drain()
    arrive(t1, t2) // lands while both queries are live — continuous
    run1.drain()
    val concurrent2 = run1.allActive
    if (!(concurrent1 && concurrent2)) {
      run1.stop("run_stopped", "concurrent=false")
      throw new IllegalStateException(
        s"continuous flows not concurrently active: " +
          s"start=$concurrent1 after-drain=$concurrent2")
    }
    run1.stop("run_stopped", "concurrent=true")

    // C arrives while the pipeline is DOWN; the resumed run must
    // process exactly it
    val nC = arrive(t2, Long.MaxValue)
    val run2 = new Runner(spark, pipeline, flows, ckpt, resume = true)
      .start()
    run2.drain()
    val exactlyOnce = run2.rowsThisRun("bronze_events") == nC
    if (!exactlyOnce) {
      run2.stop("run_completed", "exactly_once=false")
      throw new IllegalStateException(
        s"restart reprocessed sealed data: run2 bronze rows = " +
          s"${run2.rowsThisRun("bronze_events")}, expected $nC (nA=$nA)")
    }
    run2.stop("run_completed", "flows_ok=2 exactly_once=true")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    // convergence: silver ≡ the batch SCD1 recompute, transform included
    val truth = graft.operators.Cdc
      .scd1Current(graft.Tables.events(spark, dir))
      .withColumnRenamed("last_sequence", "sequence_number")
      .withColumn("value_band", floor(col("value")))
    val got = VersionedLake.read(spark, silver)
      .select(truth.columns.map(col): _*)
    // fast path: ONE signed-multiset job; the two-count forensics only
    // run when the assertion is about to throw anyway (r17)
    if (!graft.Dist.multisetEqual(truth, got)) {
      val missing = truth.exceptAll(got).count()
      val extra = got.exceptAll(truth).count()
      throw new IllegalStateException(
        s"silver diverged from batch recompute: missing=$missing extra=$extra")
    }

    spark.sql(s"SELECT * FROM event_log('$pipeline')")
  }

  val continuousGateSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       th AS (SELECT MAX(sequence_number) // 3 AS t1,
                     (MAX(sequence_number) * 2) // 3 AS t2 FROM stg),
       live AS (SELECT
         (SELECT COUNT(*) FROM (
            SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg, th WHERE sequence_number <= t1)
          WHERE rn = 1 AND operation <> 'DELETE') AS l1,
         (SELECT COUNT(*) FROM (
            SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg, th WHERE sequence_number <= t2)
          WHERE rn = 1 AND operation <> 'DELETE') AS l2,
         (SELECT COUNT(*) FROM (
            SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg)
          WHERE rn = 1 AND operation <> 'DELETE') AS l3)
       SELECT 'gate_continuous' AS pipeline, CAST(seq AS BIGINT) AS seq,
         event_type, table_name, layer, status, attempts, message,
         metric_name,
         CAST(CASE seq
           WHEN 3 THEN l1 WHEN 4 THEN l1
           WHEN 5 THEN l2 WHEN 6 THEN l2
           WHEN 11 THEN l3 WHEN 12 THEN l3
           ELSE 0 END AS BIGINT) AS metric_value
       FROM live, (VALUES
         (0, 'run_started', '', '', '', 0, 'flows=2 resume=false', ''),
         (1, 'flow_started', 'bronze_events', 'bronze', 'running', 0, '', ''),
         (2, 'flow_started', 'silver_events', 'silver', 'running', 0, '', ''),
         (3, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (4, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (5, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (6, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (7, 'run_stopped', '', '', '', 0, 'concurrent=true', ''),
         (8, 'run_started', '', '', '', 0, 'flows=2 resume=true', ''),
         (9, 'flow_started', 'bronze_events', 'bronze', 'running', 0, '', ''),
         (10, 'flow_started', 'silver_events', 'silver', 'running', 0, '', ''),
         (11, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (12, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (13, 'run_completed', '', '', '', 0,
          'flows_ok=2 exactly_once=true', '')
       ) AS t(seq, event_type, table_name, layer, status, attempts,
              message, metric_name)
       ORDER BY seq"""

  // ---- full-DAG gate (r12 verdict task 5) -----------------------------------

  /** `pipeline_continuous_dag` — continuous mode over a FULL medallion
    * DAG, the reference's `continuous` flag governing the whole
    * pipeline (ref resources/olist_pipeline.yml:24 + the bronze→
    * silver→gold DAG under src/pipelines/): the 2-flow
    * [[continuousGate]] proves the chain contract; this gate proves the
    * TOPOLOGY — one bronze change log FANNING OUT to two concurrent
    * silver consumers, and a GOLD incremental refresh consuming a
    * silver change log downstream, all four queries always-on at once:
    *
    *  - `bronze_events`: CDC feed files → bronze table (keyed merge);
    *  - `silver_events`: bronze change log → `value_band` transform →
    *    silver table (keyed merge);
    *  - `silver_users`: the SAME bronze change log → per-user `cohort`
    *    (an immutable key attribute, `pmod(key, 100)` — the realistic
    *    gold grain: reference gold partitions on order DATE, immutable
    *    per order) → a second silver table;
    *  - `gold_cohorts`: silver_users' change log → per-cohort
    *    aggregate, maintained INCREMENTALLY by the [[FlowDef.applyBatch]]
    *    contract: each microbatch names its affected cohorts (metadata-
    *    scale distinct over the change rows — tombstones included, so
    *    deletes shrink aggregates), ONLY those cohorts recompute from
    *    silver live state ([[VersionedLake.readWhere]] — file-pruned
    *    once the table is clustered on the serving predicate, the
    *    lake_cluster_by contract), a cohort whose last key disappears
    *    lands a TOMBSTONE, and the merge is an idempotent
    *    [[VersionedLake.upsertTxn]] on the batch id. Work per refresh:
    *    O(changes + affected cohorts), never O(table).
    *
    * Script and proofs mirror [[continuousGate]]: A → start → drain →
    * B arrives while all four run → drain → stop; C arrives DOWN;
    * resume processes exactly |C| feed rows; every layer's final state
    * is asserted against its batch recompute (silver twice, gold once),
    * and the ordered event rows — per-flow live-row metrics at each
    * drain — are the compared output, every value recomputed by the
    * oracle from raw events at the same thresholds.
    */
  def continuousDagGate(spark0: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val pipeline = "gate_continuous_dag"
    EventLog.clear(pipeline)
    val feed = Scratch.dir("contdag_feed")
    val bronze = Scratch.dir("contdag_bronze")
    val silverE = Scratch.dir("contdag_silver_events")
    val silverU = Scratch.dir("contdag_silver_users")
    val gold = Scratch.dir("contdag_gold")
    val ckpt = Files.createTempDirectory("graft_contdag_ckpt").toString

    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, dir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    val changes = staged
      .withColumn("_deleted", col("operation") === "DELETE")
      .drop("operation")
    def arrive(lo: Long, hi: Long): Long = {
      val part = changes.filter(col("sequence_number") > lo &&
        col("sequence_number") <= hi)
      part.repartition(1).write.mode("append").parquet(feed)
      part.count()
    }
    val feedSchema = changes.schema
    val userize: DataFrame => DataFrame =
      _.withColumn("cohort", pmod(col("key_id"), lit(100)))
    val silverUSchema = userize(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        feedSchema)).schema
    // downstream streams glob change dirs that upstream commits create
    // concurrently — ensure listable parents before any flow starts
    val hfs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    Seq(bronze, silverU).foreach(p =>
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_changes")))

    /** Incremental gold refresh: affected cohorts → pruned recompute →
      * tombstoned upsert. Exact under COW re-delivery because the
      * recompute reads LIVE state, not the batch.
      */
    def goldApply(s: SparkSession, batch: DataFrame, id: Long): Unit = {
      val cohorts = batch.select(col("cohort")).distinct()
        .collect().map(_.getLong(0)).toSeq // metadata-scale (≤100)
      if (cohorts.isEmpty) return
      val live = VersionedLake.readWhere(s, silverU,
        s"cohort IN (${cohorts.mkString(",")})")
      val recomputed = live.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("value").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).as("sum_value"))
      import s.implicits._
      val rows = cohorts.toDF("cohort")
        .join(recomputed, Seq("cohort"), "left")
        .withColumn("_deleted", col("n_users").isNull)
        .withColumn("n_users", coalesce(col("n_users"), lit(0L)))
        .withColumn("sum_value", coalesce(col("sum_value"),
          lit(0).cast(DecimalType(18, 4))))
        .withColumn("gseq", lit(id))
      VersionedLake.upsertTxn(s, gold, rows, Seq("cohort"), "gseq",
        s"$pipeline/gold_cohorts", id)
      ()
    }

    val flows = Seq(
      FlowDef("bronze_events", "bronze",
        s => s.readStream.schema(feedSchema).parquet(feed),
        bronze, Seq("key_id"), "sequence_number"),
      FlowDef("silver_events", "silver",
        s => VersionedLake.streamSource(s, bronze, feedSchema),
        silverE, Seq("key_id"), "sequence_number",
        transform = _.withColumn("value_band", floor(col("value")))),
      FlowDef("silver_users", "silver",
        s => VersionedLake.streamSource(s, bronze, feedSchema),
        silverU, Seq("key_id"), "sequence_number",
        transform = userize),
      FlowDef("gold_cohorts", "gold",
        s => VersionedLake.streamSource(s, silverU, silverUSchema),
        gold, Seq("cohort"), "gseq",
        applyBatch = Some(goldApply)))

    val nA = arrive(Long.MinValue, t1)
    val run1 = new Runner(spark, pipeline, flows, ckpt, resume = false)
      .start()
    val concurrent1 = run1.allActive
    run1.drain()
    arrive(t1, t2) // lands while all four queries are live
    run1.drain()
    val concurrent2 = run1.allActive
    if (!(concurrent1 && concurrent2)) {
      run1.stop("run_stopped", "concurrent=false")
      throw new IllegalStateException(
        s"DAG flows not concurrently active: start=$concurrent1 " +
          s"after-drain=$concurrent2")
    }
    run1.stop("run_stopped", "concurrent=true")

    val nC = arrive(t2, Long.MaxValue)
    val run2 = new Runner(spark, pipeline, flows, ckpt, resume = true)
      .start()
    run2.drain()
    val exactlyOnce = run2.rowsThisRun("bronze_events") == nC
    if (!exactlyOnce) {
      run2.stop("run_completed", "exactly_once=false")
      throw new IllegalStateException(
        s"restart reprocessed sealed data: run2 bronze rows = " +
          s"${run2.rowsThisRun("bronze_events")}, expected $nC (nA=$nA)")
    }
    run2.stop("run_completed", "flows_ok=4 exactly_once=true")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    // convergence, every layer vs its batch recompute
    val scd1 = graft.operators.Cdc
      .scd1Current(graft.Tables.events(spark, dir))
      .withColumnRenamed("last_sequence", "sequence_number")
    def assertSame(tag: String, truth: DataFrame, got: DataFrame): Unit =
      // one signed-multiset job; two-count forensics only on failure
      if (!graft.Dist.multisetEqual(truth, got)) {
        val missing = truth.exceptAll(got).count()
        val extra = got.exceptAll(truth).count()
        throw new IllegalStateException(
          s"$tag diverged from batch recompute: missing=$missing extra=$extra")
      }
    assertSame("silver_events",
      scd1.withColumn("value_band", floor(col("value"))),
      VersionedLake.read(spark, silverE)
        .select(scd1.columns.map(col) :+ col("value_band"): _*))
    assertSame("silver_users", userize(scd1),
      VersionedLake.read(spark, silverU)
        .select(scd1.columns.map(col) :+ col("cohort"): _*))
    assertSame("gold_cohorts",
      userize(scd1).groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("value").cast(DecimalType(18, 4)))
            .cast(DecimalType(18, 4)).as("sum_value")),
      VersionedLake.read(spark, gold)
        .select(col("cohort"), col("n_users"), col("sum_value")))

    spark.sql(s"SELECT * FROM event_log('$pipeline')")
  }

  val continuousDagGateSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       th AS (SELECT MAX(sequence_number) // 3 AS t1,
                     (MAX(sequence_number) * 2) // 3 AS t2 FROM stg),
       w1 AS (SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg, th WHERE sequence_number <= t1),
       w2 AS (SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg, th WHERE sequence_number <= t2),
       w3 AS (SELECT key_id, operation,
              row_number() OVER (PARTITION BY key_id
                ORDER BY sequence_number DESC) AS rn
            FROM stg),
       live AS (SELECT
         (SELECT COUNT(*) FROM w1 WHERE rn = 1 AND operation <> 'DELETE') AS l1,
         (SELECT COUNT(*) FROM w2 WHERE rn = 1 AND operation <> 'DELETE') AS l2,
         (SELECT COUNT(*) FROM w3 WHERE rn = 1 AND operation <> 'DELETE') AS l3,
         (SELECT COUNT(DISTINCT key_id % 100) FROM w1
          WHERE rn = 1 AND operation <> 'DELETE') AS c1,
         (SELECT COUNT(DISTINCT key_id % 100) FROM w2
          WHERE rn = 1 AND operation <> 'DELETE') AS c2,
         (SELECT COUNT(DISTINCT key_id % 100) FROM w3
          WHERE rn = 1 AND operation <> 'DELETE') AS c3)
       SELECT 'gate_continuous_dag' AS pipeline, CAST(seq AS BIGINT) AS seq,
         event_type, table_name, layer, status, attempts, message,
         metric_name,
         CAST(CASE seq
           WHEN 5 THEN l1 WHEN 6 THEN l1 WHEN 7 THEN l1 WHEN 8 THEN c1
           WHEN 9 THEN l2 WHEN 10 THEN l2 WHEN 11 THEN l2 WHEN 12 THEN c2
           WHEN 19 THEN l3 WHEN 20 THEN l3 WHEN 21 THEN l3 WHEN 22 THEN c3
           ELSE 0 END AS BIGINT) AS metric_value
       FROM live, (VALUES
         (0, 'run_started', '', '', '', 0, 'flows=4 resume=false', ''),
         (1, 'flow_started', 'bronze_events', 'bronze', 'running', 0, '', ''),
         (2, 'flow_started', 'silver_events', 'silver', 'running', 0, '', ''),
         (3, 'flow_started', 'silver_users', 'silver', 'running', 0, '', ''),
         (4, 'flow_started', 'gold_cohorts', 'gold', 'running', 0, '', ''),
         (5, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (6, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (7, 'flow_progress', 'silver_users', 'silver', 'ok', 0, '',
          'live_rows'),
         (8, 'flow_progress', 'gold_cohorts', 'gold', 'ok', 0, '',
          'live_rows'),
         (9, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (10, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (11, 'flow_progress', 'silver_users', 'silver', 'ok', 0, '',
          'live_rows'),
         (12, 'flow_progress', 'gold_cohorts', 'gold', 'ok', 0, '',
          'live_rows'),
         (13, 'run_stopped', '', '', '', 0, 'concurrent=true', ''),
         (14, 'run_started', '', '', '', 0, 'flows=4 resume=true', ''),
         (15, 'flow_started', 'bronze_events', 'bronze', 'running', 0, '', ''),
         (16, 'flow_started', 'silver_events', 'silver', 'running', 0, '', ''),
         (17, 'flow_started', 'silver_users', 'silver', 'running', 0, '', ''),
         (18, 'flow_started', 'gold_cohorts', 'gold', 'running', 0, '', ''),
         (19, 'flow_progress', 'bronze_events', 'bronze', 'ok', 0, '',
          'live_rows'),
         (20, 'flow_progress', 'silver_events', 'silver', 'ok', 0, '',
          'live_rows'),
         (21, 'flow_progress', 'silver_users', 'silver', 'ok', 0, '',
          'live_rows'),
         (22, 'flow_progress', 'gold_cohorts', 'gold', 'ok', 0, '',
          'live_rows'),
         (23, 'run_completed', '', '', '', 0,
          'flows_ok=4 exactly_once=true', '')
       ) AS t(seq, event_type, table_name, layer, status, attempts,
              message, metric_name)
       ORDER BY seq"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_continuous" -> ((s, d) =>
      continuousGate(s, d).orderBy(col("seq"))),
    "pipeline_continuous_dag" -> ((s, d) =>
      continuousDagGate(s, d).orderBy(col("seq"))))

  def oracles: Map[String, String] = Map(
    "pipeline_continuous" -> continuousGateSql,
    "pipeline_continuous_dag" -> continuousDagGateSql)
}
