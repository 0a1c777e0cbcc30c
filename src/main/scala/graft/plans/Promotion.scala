package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CatalogSetup.CatalogEnv

/** Environment-promotion gate — the engine analogue of the reference's
  * deploy workflows (ref .github/workflows/deploy-dev.yml /
  * deploy-staging.yml / deploy-prod.yml over databricks.yml's
  * dev/staging/prod targets): the SAME pipeline DAG is deployed per
  * environment, and promotion to the next environment is GATED on
  * validation — `bundle validate` (config lint) plus a post-deploy
  * smoke (DQ expectations on the landed output) — with a failed
  * validation leaving the downstream environment untouched.
  *
  * Engine model:
  *  - an environment = a [[CatalogEnv]] namespace (the `${catalog}`
  *    templating `catalog_region_revenue` already proves) + a
  *    warehouse of landed artifacts;
  *  - deploy = run the DAG slice and land its output under the
  *    environment's warehouse, registering the env-facing name;
  *  - promote = VALIDATE the staged artifact (lint findings must be
  *    zero — the pr-validation half — and every DQ expectation must
  *    hold on the staged rows — the smoke half), then switch the
  *    PROD-FACING NAME to the validated artifact path. The switch is a
  *    metadata re-registration — O(1) at any corpus size, the same
  *    pointer-publish discipline as `lake_branch_wap` / WAP: promotion
  *    never copies or recomputes data, so a 100 TB gold table promotes
  *    in milliseconds;
  *  - a refused promotion throws [[PromotionRefused]] naming every
  *    failed check, and the prod name keeps serving its previous
  *    artifact (engine-asserted in the gate, spec-asserted in
  *    PromotionSpec).
  *
  * The gate runs the full three-environment chain: deploy v1 to DEV →
  * promote dev→staging (validated hop) → promote staging→prod
  * (validated hop) → prove prod == staging == dev rows → deploy a
  * BROKEN v2 to dev (a negative-revenue corruption that trips the
  * smoke) → the dev→staging hop is REFUSED → prove BOTH downstream
  * environments still serve v1. The compared output is the promoted
  * prod table plus the three lifecycle flags, so the DuckDB oracle
  * re-derives the promoted state independently.
  */
object Promotion {

  final class PromotionRefused(val failures: Seq[String])
    extends RuntimeException(
      s"promotion refused: ${failures.mkString("; ")}")

  val Dev: CatalogEnv = CatalogEnv("dev")
  val Staging: CatalogEnv = CatalogEnv("staging")
  val Prod: CatalogEnv = CatalogEnv("prod")

  /** Prod-facing name of the promoted KPI (namespaced so the gate
    * never collides with the other catalog gates' tables).
    */
  def prodName: String = s"${Prod.db("gold")}.daily_orders_promoted"

  private def devName: String = s"${Dev.db("gold")}.daily_orders"
  private def stagingName: String =
    s"${Staging.db("gold")}.daily_orders"

  /** The DAG slice under promotion: the gold_daily_orders table (the
    * reference pipeline's first KPI MV), computed by the same code
    * path as its own gate.
    */
  private def candidate(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Gold.dailyOrders(
      graft.operators.Medallion.silverOrdersEnrichedItems(
        graft.Tables.orders(spark, sfDir),
        graft.Tables.lineitem(spark, sfDir)))

  /** Deploy an artifact into an environment: land the frame under the
    * env warehouse and (re-)register the env-facing name over it.
    * Returns the artifact path.
    */
  def deploy(spark: SparkSession, env: CatalogEnv, name: String,
      df: DataFrame, warehouse: String, version: String): String = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${env.db("gold")}")
    val path = s"$warehouse/${env.name}/daily_orders_$version"
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    register(spark, name, path)
    path
  }

  /** The name switch is ONE statement (CREATE OR REPLACE VIEW over the
    * artifact path), so a concurrent reader resolves either the old
    * artifact or the new one — never a missing name. The staged/prod
    * names are pure pointers; data never moves.
    */
  private def register(spark: SparkSession, name: String,
      path: String): Unit =
    spark.sql(
      s"CREATE OR REPLACE VIEW $name AS SELECT * FROM parquet.`$path`")

  /** The promotion gate's validation: pr-validation lint over the real
    * pipeline config (zero findings required) + the DQ smoke over the
    * STAGED rows. Returns every failure, empty = promotable.
    */
  def validate(spark: SparkSession, sfDir: String,
      stagedPath: String): Seq[String] = {
    val lintFindings = ConfigLint.lint(spark,
      ConfigLint.realTables(sfDir), ConfigLint.realJobs).count()
    val staged = spark.read.parquet(stagedPath)
    // the deploy-smoke expectations: shape + domain invariants of the
    // KPI — each is one aggregate over the staged artifact
    val agg = staged.agg(
      count(lit(1)).as("n"),
      count(when(col("order_date").isNull, 1)).as("null_dates"),
      count(when(col("total_orders") <= 0, 1)).as("bad_counts"),
      count(when(col("total_revenue") < 0, 1)).as("neg_revenue"),
      count(when(col("fulfilled_orders") > col("total_orders"), 1))
        .as("overfull")).head()
    Seq(
      (lintFindings > 0) -> s"config lint: $lintFindings finding(s)",
      (agg.getLong(0) == 0L) -> "smoke: staged artifact is empty",
      (agg.getLong(1) > 0L) -> s"smoke: ${agg.getLong(1)} NULL order_date",
      (agg.getLong(2) > 0L) ->
        s"smoke: ${agg.getLong(2)} rows with total_orders <= 0",
      (agg.getLong(3) > 0L) ->
        s"smoke: ${agg.getLong(3)} rows with negative total_revenue",
      (agg.getLong(4) > 0L) ->
        s"smoke: ${agg.getLong(4)} rows with fulfilled > total")
      .collect { case (failed, msg) if failed => msg }
  }

  /** Promote the staged artifact one environment hop: validate, then
    * switch the TARGET env's facing name (default: prod). Refusal
    * throws BEFORE any target mutation — the isolation contract is
    * structural (the name re-registration is the last statement), not
    * a rollback. The same hop runs dev→staging and staging→prod: the
    * reference's three deploy workflows are one mechanism applied per
    * target.
    */
  def promote(spark: SparkSession, sfDir: String, stagedPath: String,
      target: String = ""): Unit = {
    val failures = validate(spark, sfDir, stagedPath)
    if (failures.nonEmpty) throw new PromotionRefused(failures)
    val name = if (target.isEmpty) prodName else target
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${name.split('.').head}")
    register(spark, name, stagedPath)
  }

  /** Gate body — the full dev→staging→prod lifecycle with the failed
    * promotion proven isolated. Emits the promoted prod table plus the
    * lifecycle flags.
    */
  def promoteLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val warehouse = graft.sources.Scratch.dir("promo_wh")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${Prod.db("gold")}")
    spark.sql(s"DROP VIEW IF EXISTS $prodName")

    // v1: the clean candidate lands in DEV, then promotes through the
    // FULL chain — dev→staging (validated hop), staging→prod
    // (validated hop) — the reference's three-workflow topology with
    // one hop mechanism
    val v1 = deploy(spark, Dev, devName,
      candidate(spark, sfDir), warehouse, "v1")
    promote(spark, sfDir, v1, stagingName)
    promote(spark, sfDir, v1, prodName)
    def snap(name: String): Seq[org.apache.spark.sql.Row] =
      spark.table(name).orderBy(col("order_date")).collect().toSeq
    val promoted = snap(prodName)
    val prodEqualsStaged = promoted == snap(stagingName) &&
      promoted == snap(devName)
    if (!prodEqualsStaged) throw new IllegalStateException(
      "promoted prod rows differ from the staged/dev artifact")

    // v2: a broken candidate — revenue corrupted negative — lands in
    // DEV fine (that is what dev is for), but the dev→staging hop must
    // refuse it, and BOTH downstream environments must keep serving v1
    val broken = spark.read.parquet(v1).withColumn("total_revenue",
      -abs(col("total_revenue")) - lit(1.0)) // unconditionally negative

    val v2 = deploy(spark, Dev, devName, broken, warehouse, "v2")
    val refused =
      try { promote(spark, sfDir, v2, stagingName)
            false }
      catch { case e: PromotionRefused =>
        e.failures.exists(_.contains("negative total_revenue")) }
    if (!refused) throw new IllegalStateException(
      "broken candidate was not refused (or refused for the wrong rule)")
    val isolated = snap(prodName) == promoted &&
      snap(stagingName) == promoted
    if (!isolated) throw new IllegalStateException(
      "refused promotion mutated a downstream environment")

    spark.table(prodName)
      .withColumn("promoted", lit(true))
      .withColumn("prod_equals_staged", lit(prodEqualsStaged))
      .withColumn("failed_promotion_isolated", lit(isolated))
  }

  /** Oracle: the promoted prod state is exactly the v1 candidate —
    * gold_daily_orders' own SQL — with the lifecycle flags pinned
    * true. A promotion that lost rows, served the refused v2, or
    * mutated prod on refusal diverges the hash.
    */
  val promoteLifecycleSql: String =
    s"""SELECT g.*, true AS promoted, true AS prod_equals_staged,
         true AS failed_promotion_isolated
       FROM (${graft.operators.Gold.oracles("gold_daily_orders")}) g
       ORDER BY order_date"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_promote" -> ((s, d) =>
      promoteLifecycle(s, d).orderBy(col("order_date"))))

  def oracles: Map[String, String] = Map(
    "pipeline_promote" -> promoteLifecycleSql)
}
