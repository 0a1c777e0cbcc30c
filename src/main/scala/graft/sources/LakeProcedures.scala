package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for lake MAINTENANCE — `CALL
  * graft_lake.system.<proc>(…)`, the Iceberg-procedure surface
  * (`CALL cat.system.rewrite_data_files`, `expire_snapshots`, …) that
  * Spark 4 exposes natively through the DSv2
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * contract. The reference operates its tables through managed DLT
  * maintenance (auto-OPTIMIZE / auto-VACUUM of the pipeline's Delta
  * tables — ref databricks.yml pipeline config); this is that surface
  * for SQL users of the lake: layout and lifecycle verbs addressed by
  * TABLE NAME, no engine API, no path.
  *
  * Each procedure lowers onto the lake's own committed operation —
  * `optimize` → [[VersionedLake.optimizeSmallFiles]] /
  * [[VersionedLake.optimizeCluster]] / [[VersionedLake.optimizeZorder]] /
  * [[VersionedLake.clusterByAuto]], `vacuum` →
  * [[VersionedLake.vacuumPlan]]+[[VersionedLake.vacuum]], `restore` →
  * [[VersionedLake.restore]], `create_tag` →
  * [[VersionedLake.createTag]] — so CALL inherits OCC, tag retention
  * pins and history audit with no parallel code path. Every procedure
  * RETURNS ROWS (a [[LocalScan]] the analyzer turns into a relation):
  * maintenance is observable in the statement's own result, not by
  * side-channel.
  *
  * Scale: procedures are driver-side orchestration over metadata
  * (manifest line counts, version lists, the vacuum plan) — the heavy
  * lifting (bucket rewrites) is the same distributed job the engine
  * API runs; nothing here adds a row-path cost.
  */
object LakeProcedures {

  val Namespace = "system"

  private val Names = Seq("optimize", "vacuum", "restore", "create_tag",
    "create_branch", "fast_forward", "drop_branch", "enable_row_tracking",
    "txn_create", "txn_begin", "txn_commit")

  def list(ns: Array[String]): Array[Identifier] =
    if (ns.sameElements(Array(Namespace)))
      Names.map(n => Identifier.of(Array(Namespace), n)).toArray
    else Array.empty

  def load(catalog: GraftLakeCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array(Namespace)),
      s"no procedure namespace '${ident.namespace().mkString(".")}' " +
        s"(procedures live under $Namespace)")
    def path(tableName: String): String = catalog.tablePath(tableName)
    ident.name() match {
      case "optimize" => new OptimizeProc(path)
      case "vacuum" => new VacuumProc(path)
      case "restore" => new RestoreProc(path)
      case "create_tag" => new CreateTagProc(path)
      case "create_branch" => new BranchProc("create_branch", path)
      case "fast_forward" => new BranchProc("fast_forward", path)
      case "drop_branch" => new BranchProc("drop_branch", path)
      case "enable_row_tracking" => new EnableRowTrackingProc(path)
      case "txn_create" => new TxnCreateProc(path)
      case "txn_begin" => new TxnBeginProc
      case "txn_commit" => new TxnCommitProc
      case other => throw new IllegalArgumentException(
        s"unknown procedure $Namespace.$other " +
          s"(have: ${Names.mkString(", ")})")
    }
  }

  // ---- plumbing ------------------------------------------------------------

  /** Procedure output: literal rows the analyzer lifts into a
    * LocalRelation.
    */
  private final case class ProcResult(schema: StructType,
      out: Array[InternalRow]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = out
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  private def result(schema: StructType,
      rows: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      ProcResult(schema, rows.toArray): Scan).iterator()

  /** Shared shape: bound == unbound (no overloading by arity), the
    * Iceberg-procedure idiom. Procedures are side-effecting, so never
    * deterministic.
    */
  private abstract class LakeProc(procName: String,
      resolve: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def pathOf(input: InternalRow): (SparkSession, String) = {
      val table = input.getUTF8String(0).toString
      (SparkSession.active, resolve(table))
    }
    protected def filesAt(spark: SparkSession, path: String,
        v: Int): Int =
      VersionedLake.manifestEntries(spark, path, v).data.size
  }

  private def p(name: String, dt: org.apache.spark.sql.types.DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  // ---- optimize ------------------------------------------------------------

  /** `CALL system.optimize(table, mode, columns)` — layout rewrite.
    * mode: 'binpack' (small-file compaction), 'cluster' (range-cluster
    * on `columns`), 'zorder' (Morton on two comma-separated columns),
    * 'auto' (CLUSTER BY AUTO: key elected from the recorded predicate
    * history). Returns (operation, detail, version, files_before,
    * files_after).
    */
  private final class OptimizeProc(resolve: String => String)
      extends LakeProc("optimize", resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("mode", StringType, Some("'binpack'")),
      p("columns", StringType, Some("''")))
    private val schema = StructType.fromDDL(
      "operation STRING, detail STRING, version INT, " +
        "files_before INT, files_after INT")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val mode = input.getUTF8String(1).toString.toLowerCase
      val cols = input.getUTF8String(2).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      val before = VersionedLake.versions(spark, path).last
      val (detail, committed) = mode match {
        case "binpack" =>
          require(cols.isEmpty, "optimize 'binpack' takes no columns")
          ("", VersionedLake.optimizeSmallFiles(spark, path))
        case "cluster" =>
          require(cols.size == 1,
            s"optimize 'cluster' needs exactly one column, got $cols")
          (cols.head, VersionedLake.optimizeCluster(spark, path, cols.head))
        case "zorder" =>
          require(cols.size == 2,
            s"optimize 'zorder' needs exactly two columns, got $cols")
          (cols.mkString(","),
            VersionedLake.optimizeZorder(spark, path, cols.head, cols(1)))
        case "auto" =>
          require(cols.isEmpty, "optimize 'auto' elects its own key")
          val (chosen, r) = VersionedLake.clusterByAuto(spark, path)
          (chosen, r)
        case other => throw new IllegalArgumentException(
          s"unknown optimize mode '$other' " +
            "(binpack | cluster | zorder | auto)")
      }
      result(schema, Seq(row(utf8(mode.toUpperCase), utf8(detail),
        committed.version, filesAt(spark, path, before),
        filesAt(spark, path, committed.version))))
    }
  }

  // ---- vacuum --------------------------------------------------------------

  /** `CALL system.vacuum(table, retain_last, dry_run)` — reclaim files
    * only the dropped versions reference (tags stay retention roots).
    * Returns the deletion plan, one row per file (kind, file); with
    * dry_run=true nothing is deleted — same rows, zero side effects.
    */
  private final class VacuumProc(resolve: String => String)
      extends LakeProc("vacuum", resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("retain_last", IntegerType, Some("2")),
      p("dry_run", BooleanType, Some("false")))
    private val schema = StructType.fromDDL("kind STRING, file STRING")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val retain = input.getInt(1)
      val dry = input.getBoolean(2)
      val plan = VersionedLake.vacuumPlan(spark, path, retain)
      if (!dry) VersionedLake.vacuum(spark, path, retain)
      result(schema,
        plan.map { case (k, f) => row(utf8(k), utf8(f)) })
    }
  }

  // ---- restore -------------------------------------------------------------

  /** `CALL system.restore(table, version)` — roll the tip back to a
    * committed version's content as a NEW commit (history keeps the
    * whole story). Returns (version, operation).
    */
  private final class RestoreProc(resolve: String => String)
      extends LakeProc("restore", resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("version", IntegerType))
    private val schema = StructType.fromDDL("version INT, operation STRING")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val r = VersionedLake.restore(spark, path, input.getInt(1))
      result(schema, Seq(row(r.version, utf8("RESTORE"))))
    }
  }

  // ---- create_tag ----------------------------------------------------------

  /** `CALL system.create_tag(table, tag, version)` — name a version
    * (−1 = current tip) as an addressable, vacuum-pinned ref. Returns
    * (tag, version) with the version the tag resolves to.
    */
  private final class CreateTagProc(resolve: String => String)
      extends LakeProc("create_tag", resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("tag", StringType),
      p("version", IntegerType, Some("-1")))
    private val schema = StructType.fromDDL("tag STRING, version INT")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val tag = input.getUTF8String(1).toString
      val v0 = input.getInt(2)
      val v = if (v0 == -1) VersionedLake.versions(spark, path).last else v0
      VersionedLake.createTag(spark, path, tag, v)
      result(schema, Seq(row(utf8(tag), v)))
    }
  }

  // ---- branches (write-audit-publish by name) ------------------------------

  /** `CALL system.create_branch(table, branch)` /
    * `fast_forward(table, branch)` / `drop_branch(table, branch)` —
    * the Iceberg WAP surface by NAME: a writable fork, an atomic
    * publish-by-reference, and disposal. Returns (branch, version):
    * the branch tip created, the main version the fast-forward landed,
    * or -1 for a drop.
    */
  private final class BranchProc(procName: String,
      resolve: String => String) extends LakeProc(procName, resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("branch", StringType))
    private val schema = StructType.fromDDL("branch STRING, version INT")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val branch = input.getUTF8String(1).toString
      val v = procName match {
        case "create_branch" =>
          VersionedLake.createBranch(spark, path, branch).version
        case "fast_forward" =>
          VersionedLake.fastForwardBranch(spark, path, branch).version
        case "drop_branch" =>
          VersionedLake.dropBranch(spark, path, branch); -1
      }
      result(schema, Seq(row(utf8(branch), v)))
    }
  }

  // ---- row tracking --------------------------------------------------------

  /** `CALL system.enable_row_tracking(table)` — one BACKFILL commit
    * ([[VersionedLake.enableRowTracking]]): every live row gets a
    * stable identity, every later writer preserves it, and SQL readers
    * see it through the `ns.t.rows` metadata table. Returns
    * (operation, version) — the backfill commit it landed.
    */
  private final class EnableRowTrackingProc(resolve: String => String)
      extends LakeProc("enable_row_tracking", resolve) {
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType))
    private val schema = StructType.fromDDL("operation STRING, version INT")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (spark, path) = pathOf(input)
      val r = VersionedLake.enableRowTracking(spark, path)
      result(schema,
        Seq(row(utf8("ROW_TRACKING_BACKFILL"), r.version)))
    }
  }

  // ---- gate ----------------------------------------------------------------

  /** The CALL surface as a gate row — the full maintenance lifecycle
    * spoken in SQL against one registered name:
    *
    *  1. three trickle upserts build a multi-file, multi-version table;
    *  2. `CALL system.optimize(t)` compacts — the statement's OWN
    *     result row proves it (`files_after < files_before`, asserted);
    *  3. `CALL system.create_tag(t, 'compacted')` pins the tip;
    *  4. `CALL system.restore(t, v)` rolls back to the optimize commit
    *     (content-identical; history gains RESTORE — asserted);
    *  5. `CALL system.vacuum(t, 2, dry_run => true)` returns a
    *     non-empty deletion plan AND deletes nothing (asserted);
    *  6. the real vacuum deletes exactly the planned files (every
    *     planned path gone from disk, asserted engine-side).
    *
    * The emitted rows are the table content AFTER all maintenance —
    * layout and lifecycle verbs must be invisible to readers, so the
    * oracle is the plain full-feed resolution.
    */
  def sqlCall(spark: SparkSession, sfDir: String): DataFrame = {
    import SqlCatalog.CatalogName
    val path = Scratch.dir("vlake_sqlcall")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    // COW base + MOR trickle: the delta files and DV sidecars are what
    // give the optimize CALL something real to compact
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    val second = staged.filter(col("sequence_number") > t1)
    (0 to 1).foreach { i =>
      VersionedLake.dvUpsert(spark, path,
        asChanges(second.filter(pmod(col("sequence_number"), lit(2)) === i)),
        Seq("key_id"), "sequence_number")
    }
    SqlCatalog.install(spark)
    val t = s"$CatalogName.lakehouse.events_call"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")

    val opt = spark.sql(s"CALL $CatalogName.system.optimize('$t')").head()
    require(opt.getString(0) == "BINPACK" &&
      opt.getInt(4) < opt.getInt(3),
      s"optimize did not compact: $opt")
    val optVersion = opt.getInt(2)

    val tagged = spark.sql(
      s"CALL $CatalogName.system.create_tag('$t', 'compacted')").head()
    require(tagged.getString(0) == "compacted" &&
      tagged.getInt(1) == optVersion,
      s"tag row disagrees with the optimize commit: $tagged")

    val restored = spark.sql(
      s"CALL $CatalogName.system.restore('$t', $optVersion)").head()
    val historyOps = VersionedLake.history(spark, path)
      .orderBy(col("version")).collect().map(_.getString(1))
    require(historyOps.takeRight(3).sameElements(
      Array("OPTIMIZE", "CREATE_TAG", "RESTORE")),
      s"history tail is not the CALLed lifecycle: " +
        historyOps.mkString(","))

    val dryPlan = spark.sql(
      s"CALL $CatalogName.system.vacuum('$t', 2, dry_run => true)")
      .collect().map(_.getString(1))
    require(dryPlan.nonEmpty, "vacuum dry-run planned nothing — the " +
      "trickle + compaction must leave dead files")
    val fsys = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def onDisk(rel: String): Boolean =
      fsys.exists(new org.apache.hadoop.fs.Path(
        if (rel.startsWith("_")) s"$path/$rel" else s"$path/$rel"))
    require(dryPlan.forall(onDisk),
      "dry_run deleted files — it must be side-effect free")

    val realPlan = spark.sql(
      s"CALL $CatalogName.system.vacuum('$t', 2, dry_run => false)")
      .collect().map(_.getString(1))
    require(realPlan.sameElements(dryPlan),
      "real vacuum planned differently than its dry run")
    require(realPlan.forall(f => !onDisk(f)),
      "vacuum left planned files on disk")

    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("compacted", lit(true))
      .withColumn("lifecycle_ok", lit(true))
      .withColumn("vacuum_honest", lit(true))
  }

  val sqlCallSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         true AS compacted, true AS lifecycle_ok, true AS vacuum_honest
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** BRANCH WAP as a gate row — write-audit-publish by NAME:
    *
    *  1. main lands the first half of the change feed (v1) and
    *     registers;
    *  2. `CALL system.create_branch(t, 'audit1')`; a DIRTY second half
    *     (value nulled for `key_id % 4 = 0`) lands on the BRANCH
    *     chain; the audit finds the nulls and the branch is dropped —
    *     `main_untouched_by_dirty_branch` asserts main's tip manifest
    *     is BIT-IDENTICAL before/after the whole episode and the
    *     version chain never moved;
    *  3. `CALL system.create_branch(t, 'audit2')`; the CLEAN second
    *     half lands on the branch; the audit passes and
    *     `CALL system.fast_forward(t, 'audit2')` publishes —
    *     `ff_atomic` (exactly one new main version, op FAST_FORWARD)
    *     and `ff_by_reference` (every branch-built data file arrives
    *     in main as a hard link, nlink ≥ 2 — zero bytes copied) are
    *     engine-asserted.
    *
    * The emitted rows are main AFTER the publish — the full-feed SCD1
    * winners, the same state a direct write would have produced, which
    * the oracle recomputes.
    */
  def branchWap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DataType
    val path = Scratch.dir("vlake_branch")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      .localCheckpoint(true)
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    SqlCatalog.install(spark)
    val t = s"${SqlCatalog.CatalogName}.lakehouse.events_branch"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS " +
      s"${SqlCatalog.CatalogName}.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    val mainLinesBefore =
      VersionedLake.resolvedManifest(spark, path, 1)
    val second = asChanges(staged.filter(col("sequence_number") > t1))
      .localCheckpoint(true)
    // dirty episode
    spark.sql(s"CALL ${SqlCatalog.CatalogName}.system" +
      s".create_branch('lakehouse.events_branch', 'audit1')").collect()
    val bp1 = VersionedLake.branchPath(path, "audit1")
    VersionedLake.upsert(spark, bp1,
      second.withColumn("value",
        when(pmod(col("key_id"), lit(4)) === 0,
          lit(null).cast("double")).otherwise(col("value"))),
      Seq("key_id"), "sequence_number")
    val auditFailed = VersionedLake.read(spark, bp1)
      .filter(col("value").isNull).count() > 0
    spark.sql(s"CALL ${SqlCatalog.CatalogName}.system" +
      s".drop_branch('lakehouse.events_branch', 'audit1')").collect()
    val mainUntouched = auditFailed &&
      VersionedLake.versions(spark, path) == Seq(1) &&
      VersionedLake.resolvedManifest(spark, path, 1) == mainLinesBefore
    // clean episode
    spark.sql(s"CALL ${SqlCatalog.CatalogName}.system" +
      s".create_branch('lakehouse.events_branch', 'audit2')").collect()
    val bp2 = VersionedLake.branchPath(path, "audit2")
    VersionedLake.upsert(spark, bp2, second,
      Seq("key_id"), "sequence_number")
    val auditPassed = VersionedLake.read(spark, bp2)
      .filter(col("value").isNull).isEmpty
    val branchData = VersionedLake
      .resolvedManifest(spark, bp2, VersionedLake.versions(spark, bp2).last)
      .filter(l => l.startsWith("gbucket=")).toSet
    spark.sql(s"CALL ${SqlCatalog.CatalogName}.system" +
      s".fast_forward('lakehouse.events_branch', 'audit2')").collect()
    val mainVs = VersionedLake.versions(spark, path)
    val ffAtomic = auditPassed && mainVs == Seq(1, 2) &&
      VersionedLake.history(spark, path).orderBy("version").collect()
        .last.getString(1) == "FAST_FORWARD"
    val mainData = VersionedLake.resolvedManifest(spark, path, 2)
      .filter(_.startsWith("gbucket=")).toSet
    val ffByReference = mainData == branchData &&
      mainData.forall { line =>
        val rel = line.split('\t').head
        java.nio.file.Files.getAttribute(
          java.nio.file.Paths.get(
            new org.apache.hadoop.fs.Path(s"$path/$rel").toUri.getPath),
          "unix:nlink").asInstanceOf[Number].longValue >= 2
      }
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("main_untouched_by_dirty_branch", lit(mainUntouched))
      .withColumn("ff_atomic", lit(ffAtomic))
      .withColumn("ff_by_reference", lit(ffByReference))
  }

  val branchWapSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         true AS main_untouched_by_dirty_branch,
         true AS ff_atomic, true AS ff_by_reference
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_sql_call" -> ((s, d) => sqlCall(s, d).orderBy(col("key_id"))),
    "lake_branch_wap" -> ((s, d) => branchWap(s, d).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "lake_sql_call" -> sqlCallSql,
    "lake_branch_wap" -> branchWapSql)
}
