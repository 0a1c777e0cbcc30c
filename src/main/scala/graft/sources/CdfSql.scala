package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.functions._

/** The CHANGE DATA FEED as a SQL-BY-NAME surface — the two consumers a
  * lake user actually writes (ref cdc/cdc_customers_silver.sql:56-62
  * declares its silver table as a reader of a NAMED change stream):
  *
  *  - `SELECT * FROM table_changes('ns.t', v1[, v2])` — a table-valued
  *    function over [[VersionedLake.changesCdf]]'s preimage-grain diff
  *    (insert / delete / update_preimage / update_postimage), Delta's
  *    `table_changes` shape. Registered through
  *    [[graft.GraftExtensions]] (`injectTableFunction`); versions
  *    resolve against the registered catalog table, the value columns
  *    come from the table's current logical schema, and the emitted
  *    plan is the ordinary change-scale manifest-diff read — two
  *    manifests and only the files that moved between them, never a
  *    snapshot scan.
  *  - `spark.readStream.table("graft_lake.ns.t")` and
  *    `…("graft_lake.ns.t.changes")` — named streaming reads resolved
  *    by [[ResolveLakeStreams]] onto [[VersionedLake.streamChanges]]'
  *    `_changes/` file stream, so Spark's file-stream source owns
  *    offsets, checkpoint resume, and exactly-once delivery. The bare
  *    table name delivers upsert rows in the TABLE's schema
  *    (tombstones filtered — the append-ish feed a silver consumer
  *    wants); the `.changes` suffix delivers everything: `_deleted`
  *    tombstones and the producing `_commit_version`.
  */
object CdfSql {

  /** Builder for the `table_changes(name, fromVersion[, toVersion])`
    * table-valued function. Arguments must be literals (the TVF is
    * resolved on the driver during analysis, like Delta's);
    * `toVersion` defaults to the table's latest committed version.
    */
  def tableChangesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      s"table_changes(table, fromVersion[, toVersion]) takes 2 or 3 " +
        s"arguments, got ${args.size}")
    def litOf(e: Expression, what: String): Any = e match {
      case Literal(v, _) if v != null => v
      case other => throw new IllegalArgumentException(
        s"table_changes $what must be a non-null literal, got $other")
    }
    val spark = SparkSession.active
    val name = litOf(args(0), "table name").toString
    val from = litOf(args(1), "fromVersion").toString.toInt
    val cat = spark.sessionState.catalogManager
      .catalog(SqlCatalog.CatalogName).asInstanceOf[GraftLakeCatalog]
    val path = cat.tablePath(name)
    val (keys, seqCol) = cat.mergeSpecOf(name).getOrElse(
      throw new IllegalArgumentException(
        s"table_changes('$name', …) needs the table registered with " +
          "mergeKeys/mergeSeq OPTIONS — the change feed is keyed"))
    val vs = VersionedLake.versions(spark, path)
    val to = args.lift(2).map(litOf(_, "toVersion").toString.toInt)
      .getOrElse(vs.last)
    require(vs.contains(from) && vs.contains(to) && from <= to,
      s"table_changes('$name', $from, $to): versions must be committed " +
        s"and ordered (have: ${vs.mkString(", ")})")
    val valueCols = VersionedLake.read(spark, path).schema.fieldNames
      .filterNot(c => keys.contains(c) || c == seqCol).toSeq
    VersionedLake.changesCdf(spark, path, from, to, keys, seqCol,
      valueCols).queryExecution.analyzed
  }

  /** Analyzer rule resolving named streaming reads of lake tables onto
    * the `_changes/` file stream. Runs inside the resolution fixed
    * point, so by the time capability checks and the micro-batch
    * planner look at the plan, the DSv2 streaming relation is already
    * an ordinary file-source stream. Output attributes keep the
    * ORIGINAL exprIds (aliased projection), so references upstream —
    * resolved against the relation before this rewrite — stay bound.
    */
  case class ResolveLakeStreams(session: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformUp {
        case s @ StreamingRelationV2(_, _, t: GraftLakeChangesTable,
            _, _, _, _, _) =>
          align(VersionedLake.streamChanges(session, t.path), s.output)
        case s @ StreamingRelationV2(_, _, t: GraftLakeTable,
            _, _, _, _, _) if t.asOfVersion.isEmpty =>
          val full = VersionedLake.streamChanges(session, t.path)
          val live =
            if (full.columns.contains("_deleted"))
              full.filter(!coalesce(col("_deleted"), lit(false)))
            else full
          align(live, s.output)
      }

    private def align(df: DataFrame,
        output: Seq[org.apache.spark.sql.catalyst.expressions
          .AttributeReference]): LogicalPlan = {
      val np = df.queryExecution.analyzed
      val byName = np.output.map(a => a.name -> a).toMap
      Project(output.map { o =>
        val src = byName.getOrElse(o.name, throw new IllegalStateException(
          s"change stream is missing expected column '${o.name}' " +
            s"(has: ${np.output.map(_.name).mkString(", ")})"))
        Alias(src, o.name)(exprId = o.exprId)
      }, np)
    }
  }

  // ---- gate ----------------------------------------------------------------

  /** `lake_sql_cdf` — the SQL/streaming-by-name CDF surface as one
    * gate row. Emitted rows are the `table_changes` TVF's output over
    * the shared sparse-trickle fixture (all four event types,
    * hash-matched by the DuckDB oracle); the engine-asserted flags
    * pin the rest of the contract:
    *
    *  - `tvf_matches_api`: the TVF's rows equal
    *    [[VersionedLake.changesCdf]] exactly (both directions of an
    *    exceptAll) — SQL is the same plan, not a re-derivation;
    *  - `stream_resumed_only_new`: a named streaming read
    *    (`readStream.table("….changes")`, AvailableNow) run before and
    *    after one extra commit delivers exactly that commit's rows the
    *    second time — checkpoint resume by name;
    *  - `stream_saw_all_versions`: `_commit_version` over the
    *    accumulated stream output is exactly the committed version
    *    set — per-row provenance survives the stream.
    */
  def sqlCdf(spark: SparkSession, sfDir: String): DataFrame = {
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    // half 1: the TVF over the shared read-only fixture
    val path = VersionedLake.cdfFixtureTable(spark, sfDir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    val t = s"$cat.cdf.sparse"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    val last = VersionedLake.versions(spark, path).last
    val tvf = spark.sql(
      s"""SELECT key_id, _change_type, value, props, _commit_sequence
          FROM table_changes('cdf.sparse', 1, $last)""")
      .localCheckpoint(true) // reused: equality check + output
    val api = VersionedLake.changesCdf(spark, path, 1, last,
      Seq("key_id"), "sequence_number", Seq("value", "props"))
      .select(col("key_id"), col("_change_type"), col("value"),
        col("props"), col("_commit_sequence"))
    val tvfMatches = graft.Dist.multisetEqual(tvf, api)
    // half 2: named streaming read resumes incrementally
    val (resumedOnlyNew, sawAllVersions) = streamResumeProbe(spark, sfDir)
    tvf.withColumn("tvf_matches_api", lit(tvfMatches))
      .withColumn("stream_resumed_only_new", lit(resumedOnlyNew))
      .withColumn("stream_saw_all_versions", lit(sawAllVersions))
  }

  /** Builds a SMALL private trickle table (1/20th of the keys), reads
    * it by name through `readStream.table("….changes")` before and
    * after one extra MOR commit, and returns (the second run delivered
    * exactly the new commit's rows, `_commit_version` saw exactly the
    * committed versions).
    */
  private def streamResumeProbe(spark: SparkSession,
      sfDir: String): (Boolean, Boolean) = {
    import org.apache.spark.sql.streaming.Trigger
    val cat = SqlCatalog.CatalogName
    val path = Scratch.dir("vlake_sqlcdf_stream")
    val ckpt = Scratch.dir("vlake_sqlcdf_ckpt")
    val acc = Scratch.dir("vlake_sqlcdf_acc")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      .filter(pmod(col("key_id"), lit(20)) === 0)
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cdf")
    val t = s"$cat.cdf.trickle"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    def runOnce(): Long = {
      val q = spark.readStream.table(s"$t.changes")
        .writeStream.format("parquet")
        .option("path", acc).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(acc).count()
    }
    val n1 = runOnce() // v1's change rows
    val second = asChanges(staged.filter(col("sequence_number") > t1))
      .localCheckpoint(true)
    VersionedLake.dvUpsert(spark, path, second,
      Seq("key_id"), "sequence_number")
    val n2 = runOnce() // resumes: v2's rows alone
    val resumedOnlyNew =
      (n2 - n1) == second.select(col("key_id")).distinct().count()
    val seen = spark.read.parquet(acc)
      .select(col("_commit_version")).distinct()
      .collect().map(_.getInt(0)).toSet
    val sawAll = seen == VersionedLake.versions(spark, path).toSet
    (resumedOnlyNew, sawAll)
  }

  /** DuckDB mirror: the four event types re-derived from the two SCD1
    * states of the shared sparse-trickle construction (the
    * `lake_cdf_preimage` oracle with `props` carried and the stream
    * flags mirrored true).
    */
  val sqlCdfSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cutoff AS (SELECT MAX(sequence_number) // 2 AS t1 FROM stg),
       r1 AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1),
       v1 AS (
         SELECT key_id, value AS old_value, props AS old_props,
           sequence_number AS old_sequence
         FROM r1 WHERE rn = 1 AND operation <> 'DELETE'),
       feed2 AS (
         SELECT s.* FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1
            OR (s.sequence_number > c.t1 AND s.key_id % 10 = 0)),
       r2 AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM feed2 s),
       v2 AS (
         SELECT key_id, value AS new_value, props AS new_props,
           sequence_number AS new_sequence
         FROM r2 WHERE rn = 1 AND operation <> 'DELETE'),
       j AS (
         SELECT COALESCE(v1.key_id, v2.key_id) AS key_id,
           CASE WHEN v1.old_sequence IS NULL THEN 'insert'
                WHEN v2.new_sequence IS NULL THEN 'delete'
                ELSE 'update' END AS ct,
           old_value, old_props, new_value, new_props,
           old_sequence, new_sequence
         FROM v1
         FULL JOIN v2 ON v1.key_id = v2.key_id
         WHERE v1.old_sequence IS NULL OR v2.new_sequence IS NULL
            OR v1.old_sequence <> v2.new_sequence)
       SELECT key_id, 'insert' AS _change_type, new_value AS value,
         new_props AS props, new_sequence AS _commit_sequence,
         true AS tvf_matches_api, true AS stream_resumed_only_new,
         true AS stream_saw_all_versions
       FROM j WHERE ct = 'insert'
       UNION ALL
       SELECT key_id, 'delete', old_value, old_props, old_sequence,
         true, true, true
       FROM j WHERE ct = 'delete'
       UNION ALL
       SELECT key_id, 'update_preimage', old_value, old_props,
         old_sequence, true, true, true
       FROM j WHERE ct = 'update'
       UNION ALL
       SELECT key_id, 'update_postimage', new_value, new_props,
         new_sequence, true, true, true
       FROM j WHERE ct = 'update'
       ORDER BY key_id, _change_type"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_sql_cdf" -> ((s, d) =>
      sqlCdf(s, d).orderBy(col("key_id"), col("_change_type"))))

  def oracles: Map[String, String] = Map(
    "lake_sql_cdf" -> sqlCdfSql)
}
