package graft.plans

import scala.collection.mutable

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

  /** Run the DAG; returns every materialized table by name.
    * @param lakeDir when set, each table also lands as parquet
    */
  def run(spark: SparkSession, defs: Seq[TableDef],
      lakeDir: Option[String] = None): Map[String, DataFrame] = {
    val results = mutable.LinkedHashMap.empty[String, DataFrame]
    topoSort(defs).foreach { d =>
      val df = d.build(spark, results.toMap)
      // when landing, downstream deps read the MATERIALIZED table, not
      // the lazy plan — DLT semantics, and it keeps a table consumed by
      // k children from recomputing its pipeline k times
      val exposed = lakeDir.map { dir =>
        val path = s"$dir/${d.layer}/${d.name}"
        // (a landing coalesce was tried and reverted: fewer output
        // files also collapse the COMPUTE stage's parallelism, which
        // costs more on the join-heavy tables than the file-commit
        // overhead saves)
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }.getOrElse(df)
      exposed.createOrReplaceTempView(d.name) // `spark.table(name)` works
      results += d.name -> exposed
    }
    results.toMap
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
    TableDef("silver_orders_enriched", "silver",
      Seq("silver_orders", "silver_lineitem"),
      (s, _) => Medallion.silverOrdersEnriched(Tables.orders(s, sfDir),
        Tables.lineitem(s, sfDir), Tables.events(s, sfDir))),
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
    defs.map { d =>
      val n = spark.read.parquet(s"$lake/${d.layer}/${d.name}").count()
      (d.name, d.layer, n)
    }.toDF("table_name", "layer", "n_rows")
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
