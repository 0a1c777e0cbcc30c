package graft.plans

import java.util.concurrent.Executors

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Cdc, Gold, Medallion}
import graft.sources.LakeWriter

/** Declarative pipeline DAG — the engine analogue of the reference's
  * DLT pipeline (tables declare dependencies, the runtime orders and
  * materializes them; ref /root/reference/resources/olist_pipeline.yml,
  * docs/ORCHESTRATION_GUIDE.md).
  *
  * Tables are built in topological order; each result registers as a
  * temp view so downstream builders can read it, and optionally lands
  * as parquet under `lakeDir/<layer>/<name>`. Builders are lazy
  * DataFrames, so Catalyst still fuses across table boundaries when a
  * table is not persisted.
  */
object Pipeline {

  final case class TableDef(
      name: String,
      layer: String,
      deps: Seq[String],
      build: (SparkSession, Map[String, DataFrame]) => DataFrame)

  final class CycleException(names: Seq[String])
    extends RuntimeException(s"dependency cycle along: ${names.mkString(" -> ")}")

  /** Topological order (stable: insertion order among ready nodes). */
  def topoSort(defs: Seq[TableDef]): Seq[TableDef] = {
    val byName = defs.map(d => d.name -> d).toMap
    val done = mutable.LinkedHashSet.empty[String]
    // path is the actual DFS chain, so a cycle reports in walk order
    val path = mutable.ArrayBuffer.empty[String]
    def visit(d: TableDef): Unit = {
      if (done.contains(d.name)) return
      if (path.contains(d.name))
        throw new CycleException(
          (path.dropWhile(_ != d.name) :+ d.name).toSeq)
      path += d.name
      d.deps.foreach(dep => byName.get(dep).foreach(visit))
      path.remove(path.length - 1)
      done.add(d.name)
    }
    defs.foreach(visit)
    done.toSeq.map(byName)
  }

  /** Job-run policy — the engine analogue of the reference's jobs
    * config (ref /root/reference/resources/olist_jobs.yml: max_retries,
    * on-failure notifications; the notification hook becomes the
    * [[NodeReport]] table a monitor can alert on).
    *
    * @param maxRetries        re-attempts per table build after the first
    *                          failure (olist_jobs.yml `max_retries`)
    * @param continueOnFailure when true, a failed table marks its
    *                          downstream SKIPPED but independent branches
    *                          still land; when false [[run]] throws after
    *                          the DAG settles
    * @param parallelism       max concurrently-building tables
    */
  final case class RunPolicy(
      maxRetries: Int = 0,
      continueOnFailure: Boolean = false,
      parallelism: Int = 8)

  /** Per-table outcome of a DAG run: status ∈ ok | failed | skipped
    * (skipped = an upstream dependency failed), the attempt count, and
    * the last error message for failed tables — the failure-report
    * analogue of the reference's email_notifications.
    */
  final case class NodeReport(
      name: String,
      layer: String,
      status: String,
      attempts: Int,
      error: Option[String])

  private final case class Outcome(df: Option[DataFrame], report: NodeReport)

  /** Run the DAG; returns every materialized table by name. Ready nodes
    * build CONCURRENTLY (each table's future waits only on its declared
    * dependencies' futures, so independent branches — e.g. the no-dep
    * silver tables — land in parallel; Spark's scheduler interleaves
    * their jobs). Throws on the first failed table unless
    * `policy.continueOnFailure`.
    *
    * @param lakeDir when set, each table also lands as parquet
    */
  def run(spark: SparkSession, defs: Seq[TableDef],
      lakeDir: Option[String] = None,
      policy: RunPolicy = RunPolicy()): Map[String, DataFrame] = {
    val (results, reports) = runWithReport(spark, defs, lakeDir, policy)
    if (!policy.continueOnFailure)
      reports.find(_.status == "failed").foreach { r =>
        throw new RuntimeException(
          s"pipeline table ${r.name} failed after ${r.attempts} attempt(s): " +
            r.error.getOrElse(""))
      }
    results
  }

  /** [[run]] plus the per-table [[NodeReport]]s (topo order). Builders
    * receive the map of their DECLARED dependencies' results (the lazy
    * contract is unchanged: tables are fused by Catalyst unless landed).
    */
  def runWithReport(spark: SparkSession, defs: Seq[TableDef],
      lakeDir: Option[String] = None,
      policy: RunPolicy = RunPolicy()): (Map[String, DataFrame], Seq[NodeReport]) = {
    val ordered = topoSort(defs)
    val pool = Executors.newFixedThreadPool(
      math.max(1, math.min(policy.parallelism, ordered.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futures = mutable.LinkedHashMap.empty[String, Future[Outcome]]
      ordered.foreach { d =>
        // deps not defined in this DAG are ignored (matches topoSort)
        val depFs = d.deps.flatMap(futures.get)
        futures(d.name) = Future.sequence(depFs).map { deps =>
          val failedDeps = deps.filter(_.df.isEmpty).map(_.report.name)
          if (failedDeps.nonEmpty)
            Outcome(None, NodeReport(d.name, d.layer, "skipped", 0,
              Some(s"upstream failed: ${failedDeps.mkString(",")}")))
          else buildOne(spark, d, deps.map(o => o.report.name -> o.df.get).toMap,
            lakeDir, policy.maxRetries)
        }
      }
      val outcomes =
        Await.result(Future.sequence(futures.values.toSeq), Duration.Inf)
      val results = mutable.LinkedHashMap.empty[String, DataFrame]
      outcomes.foreach(o => o.df.foreach(results += o.report.name -> _))
      (results.toMap, outcomes.map(_.report))
    } finally pool.shutdown()
  }

  /** One table: build + optional landing, with up to `maxRetries`
    * re-attempts. Landing notes: when landing, downstream deps read the
    * MATERIALIZED table, not the lazy plan — DLT semantics, and it keeps
    * a table consumed by k children from recomputing its pipeline k
    * times. (A landing coalesce was tried and reverted: fewer output
    * files also collapse the COMPUTE stage's parallelism, which costs
    * more on the join-heavy tables than the file-commit overhead saves.)
    */
  private def buildOne(spark: SparkSession, d: TableDef,
      deps: Map[String, DataFrame], lakeDir: Option[String],
      maxRetries: Int): Outcome = {
    var attempt = 0
    var out: Option[Outcome] = None
    while (out.isEmpty) {
      attempt += 1
      val t0 = System.nanoTime()
      try {
        val df = d.build(spark, deps)
        val exposed = lakeDir.map { dir =>
          val path = s"$dir/${d.layer}/${d.name}"
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        }.getOrElse(df)
        exposed.createOrReplaceTempView(d.name) // `spark.table(name)` works
        System.err.println(f"[pipeline] ${d.name} ok in " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs (attempt $attempt)")
        out = Some(Outcome(Some(exposed),
          NodeReport(d.name, d.layer, "ok", attempt, None)))
      } catch {
        case NonFatal(e) if attempt <= maxRetries =>
          // each failed attempt is logged (a silent retry loses the
          // transient error's diagnosis) and backed off briefly so a
          // deterministic failure doesn't hot-loop the executor pool
          System.err.println(
            s"[pipeline] ${d.name} attempt $attempt failed, retrying: $e")
          Thread.sleep(math.min(1000L << (attempt - 1), 5000L))
        case NonFatal(e) =>
          out = Some(Outcome(None, NodeReport(d.name, d.layer, "failed",
            attempt, Some(e.toString))))
      }
    }
    out.get
  }

  /** The full medallion DAG over the testdata schema — the engine's
    * equivalent of the reference's main pipeline (bronze → silver →
    * gold) plus the CDC flow.
    */
  def medallion(sfDir: String): Seq[TableDef] = Seq(
    TableDef("silver_orders", "silver", Nil,
      (s, _) => Medallion.silverOrders(Tables.orders(s, sfDir))),
    TableDef("silver_lineitem", "silver", Nil,
      (s, _) => Medallion.silverLineitem(Tables.lineitem(s, sfDir))),
    TableDef("silver_customers", "silver", Nil,
      (s, _) => Medallion.silverCustomers(Tables.customer(s, sfDir),
        Tables.nation(s, sfDir), Tables.region(s, sfDir))),
    TableDef("silver_payments", "silver", Nil,
      (s, _) => Medallion.silverPayments(Tables.events(s, sfDir))),
    TableDef("silver_reviews", "silver", Nil,
      (s, _) => Medallion.silverReviews(Tables.events(s, sfDir))),
    // enriched composes the LANDED silver tables (DLT semantics: the
    // materialized upstream, not a re-cleanse of the raw inputs)
    TableDef("silver_orders_enriched", "silver",
      Seq("silver_orders", "silver_lineitem", "silver_payments",
        "silver_reviews"),
      (_, t) => Medallion.silverOrdersEnrichedFromSilver(
        t("silver_orders"), t("silver_lineitem"),
        t("silver_payments"), t("silver_reviews"))),
    TableDef("gold_daily_orders", "gold", Seq("silver_orders_enriched"),
      (_, t) => Gold.dailyOrders(t("silver_orders_enriched"))),
    TableDef("gold_monthly_orders", "gold", Seq("silver_orders_enriched"),
      (_, t) => Gold.monthlyOrders(t("silver_orders_enriched"))),
    TableDef("scd1_current", "cdc", Nil,
      (s, _) => Cdc.scd1Current(Tables.events(s, sfDir))),
    TableDef("scd2_history", "cdc", Nil,
      (s, _) => Cdc.scd2History(Tables.events(s, sfDir))))

  /** Which gate oracle carries each DAG table's definition — the
    * manifest oracle counts over these, so the DAG run is verified by
    * the SAME SQL that already verifies each table individually.
    */
  private val oracleOf: Map[String, String] = Map(
    "silver_orders" -> Medallion.oracles("silver_orders"),
    "silver_lineitem" -> Medallion.oracles("silver_lineitem"),
    "silver_customers" -> Medallion.oracles("silver_customers"),
    "silver_payments" -> Medallion.oracles("silver_payments"),
    "silver_reviews" -> Medallion.oracles("silver_reviews"),
    "silver_orders_enriched" -> Medallion.oracles("silver_orders_enriched"),
    "gold_daily_orders" -> Gold.oracles("gold_daily_orders"),
    "gold_monthly_orders" -> Gold.oracles("gold_monthly_orders"),
    "scd1_current" -> Cdc.oracles("cdc_scd1_current"),
    "scd2_history" -> Cdc.oracles("cdc_scd2_history"))

  /** Gate entry: run the WHOLE medallion DAG landing every table to a
    * scratch lake, then read the LANDED parquet back and report the
    * run manifest (table, layer, row count) — the end-to-end
    * orchestration check (topo order, cross-table wiring, and the
    * physical landing all have to work for the counts to match). The
    * 8 counts that reach the driver are the manifest itself, not data.
    */
  def runManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lake = graft.sources.Scratch.dir("pipe_lake")
    val defs = medallion(sfDir)
    run(spark, defs, lakeDir = Some(lake))
    // manifest counts run concurrently — independent footer-metadata
    // count jobs, no reason to serialize the scheduler round-trips
    val pool = Executors.newFixedThreadPool(math.min(8, defs.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val rows = try Await.result(Future.sequence(defs.map(d => Future {
        val n = spark.read.parquet(s"$lake/${d.layer}/${d.name}").count()
        (d.name, d.layer, n)
      })), Duration.Inf)
    finally pool.shutdown()
    rows.toDF("table_name", "layer", "n_rows")
  }

  val runManifestSql: String = {
    val branches = medallion("unused").map { d =>
      s"""SELECT '${d.name}' AS table_name, '${d.layer}' AS layer,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM (${oracleOf(d.name)})"""
    }.mkString("\n       UNION ALL\n       ")
    s"""SELECT * FROM (
       $branches)
       ORDER BY table_name"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_manifest" -> ((s, d) =>
      runManifest(s, d).orderBy(org.apache.spark.sql.functions.col("table_name"))))

  def oracles: Map[String, String] = Map(
    "pipeline_manifest" -> runManifestSql)
}
