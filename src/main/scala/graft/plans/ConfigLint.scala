package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-config lint — the engine analogue of the reference's CI
  * validation job (ref /root/reference/.github/workflows/pr-validation
  * .yml + tests/sql/test_sql_validation.py: every PR lints the pipeline
  * SQL and the jobs YAML before anything deploys). The config under
  * lint is the SAME metadata the engine actually runs — the
  * [[Pipeline.medallion]] DAG and the run-calendar job table — plus a
  * deliberately-broken fixture block in which each row trips exactly
  * one rule, so the lint's whole rule surface is exercised and the
  * clean real config is proven clean in the same report.
  *
  * Rules (all metadata-relational — config is driver-scale data, every
  * join below is a broadcast over a few dozen rows):
  *  - `duplicate_name`    a table declared more than once
  *  - `unknown_dep`       an edge to a table nobody declares
  *  - `self_dep`          a table depending on itself
  *  - `dependency_cycle`  membership in a cycle of length ≥ 2 (length 1
  *                        is `self_dep`; found by driver-side DFS over
  *                        the spec, the same walk [[Pipeline.topoSort]]
  *                        does — config graphs are metadata, not data)
  *  - `layer_inversion`   an edge against the medallion flow (e.g. a
  *                        bronze table reading a gold table)
  *  - `no_input`          a table with neither deps nor sources — it
  *                        can never land anything
  *  - `cron_syntax`       a job schedule that is not 5 cron fields of
  *                        cron charset (the strict semantic validation
  *                        stays [[Schedule.parse]]'s job; lint is the
  *                        cheap syntactic pre-gate CI runs)
  *  - `job_unknown_table` a job targeting a table the DAG doesn't have
  *
  * The DuckDB oracle re-derives every finding from the same spec rows
  * (emitted as VALUES from the one Scala definition — single source of
  * truth), with the cycle rule as a recursive reachability CTE.
  */
object ConfigLint {

  final case class SpecTable(name: String, layer: String,
      deps: Seq[String], hasSources: Boolean)
  final case class SpecJob(job: String, cron: String, target: String)

  /** Medallion flow order; an edge may only point at the same rank or
    * earlier (cdc sits beside silver).
    */
  val LayerRank: Seq[(String, Int)] =
    Seq("bronze" -> 0, "silver" -> 1, "cdc" -> 1, "gold" -> 2)

  /** 5 whitespace-separated fields of cron charset — same regex
    * dialect in Java (`rlike`) and DuckDB RE2.
    */
  val CronShape = "^[0-9*,/-]+( [0-9*,/-]+){4}$"

  /** The REAL config: the medallion DAG's metadata (name, layer, deps,
    * has-sources) and the run-calendar's jobs bound to DAG targets.
    * Expected lint findings: none.
    */
  def realTables(sfDir: String): Seq[SpecTable] =
    Pipeline.medallion(sfDir).map(d =>
      SpecTable(d.name, d.layer, d.deps, d.sources.nonEmpty))

  val realJobs: Seq[SpecJob] = Seq(
    SpecJob("daily_incremental", "30 6 * * *", "gold_daily_orders"),
    SpecJob("weekly_full_refresh", "0 3 * * 1", "gold_monthly_orders"),
    SpecJob("workday_quarter_hourly", "*/15 9-17 * * 1-5",
      "silver_orders_enriched"),
    SpecJob("month_end_close", "59 23 28-31 * *", "gold_monthly_orders"))

  /** The broken fixture: one row (or pair) per rule. */
  val brokenTables: Seq[SpecTable] = Seq(
    SpecTable("bad_dup", "silver", Nil, hasSources = true),
    SpecTable("bad_dup", "silver", Nil, hasSources = true),
    SpecTable("bad_unknown", "silver", Seq("nope"), hasSources = true),
    SpecTable("bad_self", "silver", Seq("bad_self"), hasSources = true),
    SpecTable("bad_cyc_a", "silver", Seq("bad_cyc_b"), hasSources = true),
    SpecTable("bad_cyc_b", "silver", Seq("bad_cyc_a"), hasSources = true),
    SpecTable("bad_layer", "bronze", Seq("gold_daily_orders"),
      hasSources = true),
    SpecTable("bad_island", "silver", Nil, hasSources = false))

  val brokenJobs: Seq[SpecJob] = Seq(
    SpecJob("bad_cron_job", "99 99 * *", "gold_daily_orders"),
    SpecJob("bad_target_job", "0 0 * * *", "no_such_table"))

  /** Names on a directed cycle of length ≥ 2 — driver DFS over spec
    * metadata (self-loops excluded; they are `self_dep`'s finding).
    */
  def cycleNodes(tables: Seq[SpecTable]): Seq[String] = {
    val adj: Map[String, Seq[String]] = tables
      .flatMap(t => t.deps.filter(_ != t.name).map(t.name -> _))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def reachesSelf(start: String): Boolean = {
      val seen = mutable.Set.empty[String]
      def dfs(n: String): Boolean = adj.getOrElse(n, Nil).exists(m =>
        m == start || (seen.add(m) && dfs(m)))
      dfs(start)
    }
    tables.map(_.name).distinct.filter(reachesSelf).sorted
  }

  /** Lint a config: findings (rule, node, detail), empty when clean. */
  def lint(spark: SparkSession, tables: Seq[SpecTable],
      jobs: Seq[SpecJob]): DataFrame = {
    import spark.implicits._
    val t = tables.map(x => (x.name, x.layer, x.deps, x.hasSources))
      .toDF("name", "layer", "deps", "has_sources")
    val j = jobs.map(x => (x.job, x.cron, x.target))
      .toDF("job", "cron", "target")
    val names = t.select(col("name")).distinct()
    val edges = t.select(col("name"), col("layer"),
      explode(col("deps")).as("dep"))
    val ranks = LayerRank.toDF("layer", "rnk")

    val dup = t.groupBy(col("name")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(lit("duplicate_name").as("rule"), col("name").as("node"),
        concat(lit("declared "), col("n").cast("string"),
          lit(" times")).as("detail"))
    val unknown = edges
      .join(names.withColumnRenamed("name", "dep"), Seq("dep"), "left_anti")
      .select(lit("unknown_dep").as("rule"), col("name").as("node"),
        concat(lit("missing dependency: "), col("dep")).as("detail"))
    val selfDep = edges.filter(col("name") === col("dep"))
      .select(lit("self_dep").as("rule"), col("name").as("node"),
        lit("depends on itself").as("detail"))
    val depLayers = t.select(col("name").as("dep"),
      col("layer").as("dep_layer")).distinct()
    val inversion = edges
      .join(depLayers, Seq("dep"))
      .join(ranks, Seq("layer"))
      .join(ranks.select(col("layer").as("dep_layer"),
        col("rnk").as("dep_rnk")), Seq("dep_layer"))
      .filter(col("dep_rnk") > col("rnk"))
      .select(lit("layer_inversion").as("rule"), col("name").as("node"),
        concat(col("layer"), lit(" table depends on "), col("dep_layer"),
          lit(" '"), col("dep"), lit("'")).as("detail"))
    val cyc = cycleNodes(tables) match {
      case Nil => spark.emptyDataFrame
        .withColumn("rule", lit("")).withColumn("node", lit(""))
        .withColumn("detail", lit("")).limit(0)
      case ns => names.filter(col("name").isin(ns: _*))
        .select(lit("dependency_cycle").as("rule"), col("name").as("node"),
          lit("member of a dependency cycle").as("detail"))
    }
    val noInput = t.filter(size(col("deps")) === 0 && !col("has_sources"))
      .select(lit("no_input").as("rule"), col("name").as("node"),
        lit("no deps and no sources").as("detail"))
    val cronBad = j.filter(!col("cron").rlike(CronShape))
      .select(lit("cron_syntax").as("rule"), col("job").as("node"),
        concat(lit("unparseable cron: '"), col("cron"), lit("'"))
          .as("detail"))
    val jobTarget = j
      .join(names.withColumnRenamed("name", "target"), Seq("target"),
        "left_anti")
      .select(lit("job_unknown_table").as("rule"), col("job").as("node"),
        concat(lit("job targets undeclared table '"), col("target"),
          lit("'")).as("detail"))

    Seq(dup, unknown, selfDep, inversion, cyc, noInput, cronBad, jobTarget)
      .reduce(_.unionByName(_))
  }

  // ---- oracle --------------------------------------------------------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** VALUES-emitting oracle over the same spec rows (the recursive CTE
    * is the cycle rule; everything else is one pass each).
    */
  def lintSql(tables: Seq[SpecTable], jobs: Seq[SpecJob]): String = {
    val tVals = tables.map(t =>
      s"(${q(t.name)}, ${q(t.layer)}, ${t.deps.size}, ${t.hasSources})")
      .mkString(", ")
    val edges = tables.flatMap(t => t.deps.map(t.name -> _))
    val eVals =
      if (edges.isEmpty) "(NULL, NULL)"
      else edges.map { case (n, d) => s"(${q(n)}, ${q(d)})" }.mkString(", ")
    val jVals = jobs.map(x =>
      s"(${q(x.job)}, ${q(x.cron)}, ${q(x.target)})").mkString(", ")
    val rVals = LayerRank.map { case (l, r) => s"(${q(l)}, $r)" }
      .mkString(", ")
    s"""WITH RECURSIVE
       spec_tables(name, layer, n_deps, has_sources) AS (VALUES $tVals),
       spec_edges(name, dep) AS (
         SELECT name, dep FROM (VALUES $eVals) v(name, dep)
         WHERE name IS NOT NULL),
       spec_jobs(job, cron, target) AS (VALUES $jVals),
       ranks(layer, rnk) AS (VALUES $rVals),
       names AS (SELECT DISTINCT name FROM spec_tables),
       dup AS (
         SELECT 'duplicate_name' AS rule, name AS node,
           'declared ' || CAST(COUNT(*) AS VARCHAR) || ' times' AS detail
         FROM spec_tables GROUP BY name HAVING COUNT(*) > 1),
       unknown AS (
         SELECT 'unknown_dep' AS rule, e.name AS node,
           'missing dependency: ' || e.dep AS detail
         FROM spec_edges e LEFT JOIN names n ON e.dep = n.name
         WHERE n.name IS NULL),
       self_dep AS (
         SELECT 'self_dep' AS rule, name AS node,
           'depends on itself' AS detail
         FROM spec_edges WHERE name = dep),
       inversion AS (
         SELECT 'layer_inversion' AS rule, e.name AS node,
           tl.layer || ' table depends on ' || dl.layer || ' ''' ||
             e.dep || '''' AS detail
         FROM spec_edges e
         JOIN (SELECT DISTINCT name, layer FROM spec_tables) tl
           ON e.name = tl.name
         JOIN (SELECT DISTINCT name, layer FROM spec_tables) dl
           ON e.dep = dl.name
         JOIN ranks r1 ON tl.layer = r1.layer
         JOIN ranks r2 ON dl.layer = r2.layer
         WHERE r2.rnk > r1.rnk),
       reach(src, dst) AS (
         SELECT name, dep FROM spec_edges WHERE name <> dep
         UNION
         SELECT r.src, e.dep FROM reach r
         JOIN spec_edges e ON r.dst = e.name AND e.name <> e.dep),
       cyc AS (
         SELECT 'dependency_cycle' AS rule, src AS node,
           'member of a dependency cycle' AS detail
         FROM (SELECT DISTINCT src FROM reach WHERE src = dst)),
       no_input AS (
         SELECT 'no_input' AS rule, name AS node,
           'no deps and no sources' AS detail
         FROM spec_tables WHERE n_deps = 0 AND NOT has_sources),
       cron_bad AS (
         SELECT 'cron_syntax' AS rule, job AS node,
           'unparseable cron: ''' || cron || '''' AS detail
         FROM spec_jobs
         WHERE NOT regexp_matches(cron, '^[0-9*,/-]+( [0-9*,/-]+){4}$$')),
       job_target AS (
         SELECT 'job_unknown_table' AS rule, job AS node,
           'job targets undeclared table ''' || target || '''' AS detail
         FROM spec_jobs j LEFT JOIN names n ON j.target = n.name
         WHERE n.name IS NULL)
       SELECT rule, node, detail FROM (
         SELECT * FROM dup UNION ALL SELECT * FROM unknown
         UNION ALL SELECT * FROM self_dep UNION ALL SELECT * FROM inversion
         UNION ALL SELECT * FROM cyc UNION ALL SELECT * FROM no_input
         UNION ALL SELECT * FROM cron_bad UNION ALL SELECT * FROM job_target)
       ORDER BY rule, node, detail"""
  }

  // ---- registry ------------------------------------------------------------

  private def gateTables(d: String): Seq[SpecTable] =
    realTables(d) ++ brokenTables
  private val gateJobs: Seq[SpecJob] = realJobs ++ brokenJobs

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_config_lint" -> ((s, d) =>
      lint(s, gateTables(d), gateJobs)
        .orderBy(col("rule"), col("node"), col("detail"))))

  def oracles: Map[String, String] = Map(
    "pipeline_config_lint" ->
      lintSql(gateTables("/root/testdata/sf0.01"), gateJobs))
}
