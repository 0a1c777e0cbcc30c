package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  StagedTable, StagingTableCatalog, SupportsNamespaces, SupportsRead,
  Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual,
  TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft_lake` — the versioned lake exposed to SPARK SQL through a
  * DataSource V2 [[TableCatalog]] plugin: the composition every
  * reference query assumes (all reference tables are `db.table` names
  * resolved through Unity Catalog onto Delta locations). With
  *
  * {{{ spark.sql.catalog.graft_lake = graft.sources.GraftLakeCatalog }}}
  *
  * a lake table registers once
  * (`CREATE TABLE graft_lake.ns.t USING graft LOCATION '<path>'`) and
  * then every SQL surface works against the NAME:
  *
  *  - `SELECT … FROM graft_lake.ns.t` — snapshot read honoring DVs,
  *    tombstones, column mapping, dropped columns and type widening
  *    (the scan delegates to [[VersionedLake.read]], so every lake
  *    semantic is inherited rather than re-implemented);
  *  - `… VERSION AS OF n` — [[TableCatalog.loadTable(Identifier,String)]]
  *    resolves the pinned manifest: SQL time travel;
  *  - `… TIMESTAMP AS OF ts` — resolves through
  *    [[VersionedLake.versionAtTimestamp]]'s last-at-or-before rule;
  *  - WHERE clauses PUSH DOWN: accepted filters route the scan through
  *    [[VersionedLake.readWhere]], so the manifest's per-file stats cut
  *    the file list before any IO — SQL users get data skipping for
  *    free, and accepted filters are applied exactly row-level by the
  *    lake (never re-evaluated Spark-side);
  *  - column pruning reaches the scan ([[SupportsPushDownRequiredColumns]]).
  *
  * The scan hands Spark a [[V1Scan]] whose relation builds on the
  * lake's own DataFrame — the idiomatic bridge (JDBC's DSv2 connector
  * ships the same shape) that keeps ONE implementation of the MOR
  * read path instead of a parallel `PartitionReader` re-implementation
  * that would drift from it.
  *
  * Registration state is per-catalog-instance (per session), exactly
  * like the in-memory session catalog; a shared metastore deployment
  * would persist the ident→location map instead.
  */
class GraftLakeCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "graft_lake"
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val namespaces =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // COMMENT metadata (ref unity_catalog_setup.py:42-72 stamps COMMENTs
  // on catalog objects and introspects them): per-object comment text,
  // session-scoped like the registration maps above
  private val tableComments =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val nsComments =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // VOLUMES — named storage-location objects (ref
  // unity_catalog_setup.py:96-120 creates the raw landing VOLUME):
  // fully-qualified "ns.volume" → filesystem location. Volumes are
  // ingest-addressable by NAME (FileRegistry's volume:// scheme), so
  // pipelines never carry raw paths — the Unity Volume contract.
  private val volumes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[sources] def createVolume(fq: String, location: String): Boolean =
    volumes.putIfAbsent(fq, location) == null
  private[sources] def dropVolume(fq: String): Boolean =
    volumes.remove(fq) != null
  private[graft] def volumeLocation(fq: String): Option[String] =
    Option(volumes.get(fq))
  private[sources] def volumesOf(ns: String): Seq[(String, String, String)] =
    volumes.asScala.toSeq.collect {
      // exactly one remaining segment: a volume under a NESTED
      // namespace ("a.b.v") must not list in the parent's a.volumes
      case (fq, loc) if fq.startsWith(ns + ".") &&
          !fq.stripPrefix(ns + ".").contains('.') =>
        (ns, fq.stripPrefix(ns + "."), loc)
    }.sortBy(_._2)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def defaultNamespace(): Array[String] = Array("default")

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val prefix = ns.mkString(".") + "."
    tables.keySet().asScala.toArray.collect {
      case k if k.startsWith(prefix) =>
        Identifier.of(ns, k.stripPrefix(prefix))
    }
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style METADATA TABLES: `ns.t.history` / `ns.t.tags`
    // resolve when `ns.t` is a registered data table — the commit
    // audit and the tag table become ordinary SQL relations
    if (tables.get(key(ident)) == null && ident.namespace().nonEmpty) {
      val parent = Identifier.of(ident.namespace().dropRight(1),
        ident.namespace().last)
      val parentPath = tables.get(key(parent))
      if (parentPath != null && MetaTables.contains(ident.name()))
        return new GraftLakeMetaTable(key(parent), parentPath,
          ident.name(),
          () => Option(tableComments.get(key(parent))))
      // `ns.t.changes` — the table's CHANGE FEED as a STREAMING
      // relation (Delta readChangeFeed by name): tombstones and
      // commit versions included. Resolved onto the `_changes/` file
      // stream by CdfSql.ResolveLakeStreams during analysis.
      if (parentPath != null && ident.name() == "changes")
        return new GraftLakeChangesTable(key(parent), parentPath)
      // `ns.t.branch_<name>` — the BRANCH as an ordinary table
      // identifier (Iceberg's branch_ identifier convention): every
      // read AND write surface (SELECT, INSERT, MERGE, metadata) works
      // on the branch chain unchanged, because a branch IS a full lake
      // chain under `_branches/<name>`; the parent's merge contract
      // carries over so keyed DML keeps its semantics on the branch
      if (parentPath != null && ident.name().startsWith("branch_")) {
        val b = ident.name().stripPrefix("branch_")
        val bp = VersionedLake.branchPath(parentPath, b)
        if (VersionedLake.versions(SparkSession.active, bp).isEmpty)
          throw new NoSuchTableException(ident)
        return new GraftLakeTable(s"${key(parent)}.branch_$b", bp, None,
          Option(mergeSpecs.get(key(parent))))
      }
    }
    // `ns.volumes` — the namespace's volume inventory as a relation
    // (SHOW VOLUMES / DESCRIBE VOLUME introspection surface)
    if (tables.get(key(ident)) == null && ident.name() == "volumes" &&
        ident.namespace().nonEmpty && namespaceExists(ident.namespace())) {
      val ns = ident.namespace().mkString(".")
      return new GraftVolumesTable(ns, () => volumesOf(ns))
    }
    load(ident, None)
  }

  private val MetaTables =
    Set("history", "tags", "partitions", "files", "snapshots", "rows",
      "refs", "describe")

  /** The registered merge contract (keys, seqCol) of `name`, for the
    * table_changes TVF; accepts the catalog-qualified form.
    */
  private[sources] def mergeSpecOf(
      name: String): Option[(Seq[String], String)] = {
    val bare =
      if (name.startsWith(catalogName + "."))
        name.stripPrefix(catalogName + ".")
      else name
    Option(mergeSpecs.get(bare))
  }

  // -- StagingTableCatalog: atomic CTAS / RTAS -------------------------------
  // Spark routes CREATE TABLE … AS SELECT and REPLACE TABLE … AS
  // SELECT through these when the catalog stages — the staged table
  // buffers the query, commitStagedChanges lands registration + data
  // as one statement, abortStagedChanges guarantees no orphan (see
  // GraftStagedTable).

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (tables.containsKey(key(ident)))
      throw new TableAlreadyExistsException(ident)
    requireNoPartitions(ident, partitions)
    new GraftStagedTable(this, ident, schema, properties,
      GraftStagedTable.Create)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    if (!tables.containsKey(key(ident)))
      throw new NoSuchTableException(ident)
    requireNoPartitions(ident, partitions)
    new GraftStagedTable(this, ident, schema, properties,
      GraftStagedTable.Replace)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable = {
    requireNoPartitions(ident, partitions)
    new GraftStagedTable(this, ident, schema, properties,
      GraftStagedTable.CreateOrReplace)
  }

  private def requireNoPartitions(ident: Identifier,
      partitions: Array[Transform]): Unit =
    require(partitions.isEmpty,
      s"CREATE/REPLACE TABLE ${key(ident)}: PARTITIONED BY is not " +
        "supported — the lake manages physical layout")

  private[sources] def identKeyOf(ident: Identifier): String = key(ident)
  private[sources] def isRegistered(identKey: String): Boolean =
    tables.containsKey(identKey)
  private[sources] def registeredPath(identKey: String): Option[String] =
    Option(tables.get(identKey))
  private[sources] def register(identKey: String, path: String,
      spec: Option[(Seq[String], String)]): Unit = {
    tables.put(identKey, path)
    spec.foreach(mergeSpecs.put(identKey, _))
  }

  /** SQL `VERSION AS OF n` — or `VERSION AS OF '<ref>'`, the Iceberg
    * ref-name form: a non-numeric version resolves through the tip's
    * tag table ([[VersionedLake.tags]]) first, then through the BRANCH
    * list — so an audit snapshot OR a branch tip is addressable from
    * SQL by MEANING (a branch read is the branch chain's tip, the same
    * relation `ns.t.branch_<name>` serves).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException =>
        val path = pathOf(ident)
        val spark = SparkSession.active
        val t = VersionedLake.tags(spark, path)
        t.get(version) match {
          case Some(tv) => tv
          case None if VersionedLake.branches(spark, path)
              .contains(version) =>
            return new GraftLakeTable(s"${key(ident)}.branch_$version",
              VersionedLake.branchPath(path, version), None,
              Option(mergeSpecs.get(key(ident))))
          case None => throw new IllegalArgumentException(
            s"'$version' is neither a version number, a tag nor a " +
              s"branch of ${key(ident)} (tags: " +
              s"${t.keys.toSeq.sorted.mkString(", ")}; branches: " +
              s"${VersionedLake.branches(spark, path).mkString(", ")})")
        }
    }
    load(ident, Some(v))
  }

  /** SQL `TIMESTAMP AS OF ts` (micros since epoch from Spark). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    val v = VersionedLake.versionAtTimestamp(SparkSession.active, path,
      timestampMicros / 1000L)
    load(ident, Some(v))
  }

  private def pathOf(ident: Identifier): String = {
    val p = tables.get(key(ident))
    if (p == null) throw new NoSuchTableException(ident)
    p
  }

  /** Name → lake path for the stored procedures; accepts the
    * catalog-qualified form CALL statements naturally carry.
    */
  /** [[tablePath]] for sibling packages (the EXPECT DDL commands). */
  private[graft] def lakeTablePath(name: String): String = tablePath(name)

  private[sources] def tablePath(name: String): String = {
    val bare =
      if (name.startsWith(catalogName + "."))
        name.stripPrefix(catalogName + ".")
      else name
    val p = tables.get(bare)
    require(p != null,
      s"no registered lake table '$bare' in catalog $catalogName")
    p
  }

  // -- ProcedureCatalog (CALL graft_lake.system.<proc>) ---------------------
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LakeProcedures.load(this, ident)
  override def listProcedures(ns: Array[String]): Array[Identifier] =
    LakeProcedures.list(ns)

  private def load(ident: Identifier, v: Option[Int]): Table = {
    val mergeSpec = Option(mergeSpecs.get(key(ident)))
    new GraftLakeTable(key(ident), pathOf(ident), v, mergeSpec)
  }

  private val mergeSpecs =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[String], String)]()

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val props = properties.asScala
    def opt(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    val loc = opt("location").orElse(opt("path")).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE TABLE ${key(ident)} USING graft requires a LOCATION " +
          "(the lake table path)"))
    // Spark normalizes LOCATION to a URI (file:/tmp/...); the lake
    // speaks plain paths on the local scheme (its link(2) publish
    // primitive does), so strip the scheme it would choke on
    val path = {
      val uri = try new java.net.URI(loc) catch {
        case _: java.net.URISyntaxException => null
      }
      if (uri != null && uri.getScheme == "file") uri.getPath else loc
    }
    require(VersionedLake.versions(SparkSession.active, path).nonEmpty,
      s"no committed lake versions at $path — commit data before " +
        "registering the name")
    // the lake's physical layout is engine-managed (hash buckets, DV
    // sidecars): a PARTITIONED BY clause would register a contract the
    // relation cannot honor, so refuse it rather than ignore it
    require(partitions.isEmpty,
      s"CREATE TABLE ${key(ident)}: PARTITIONED BY is not supported — " +
        "the lake manages physical layout (hash buckets / CLUSTER BY)")
    // the declared columns are a CONTRACT: registration must fail when
    // they contradict the lake table's actual schema (otherwise the DDL
    // and the served relation silently disagree)
    if (schema.fields.nonEmpty) {
      val actual = VersionedLake.read(SparkSession.active, path).schema
      val actualByName = actual.fields.map(f => f.name -> f.dataType).toMap
      val problems = schema.fields.flatMap { f =>
        actualByName.get(f.name) match {
          case None => Some(s"'${f.name}' is not a column of the lake " +
            s"table (has: ${actual.fieldNames.mkString(", ")})")
          case Some(dt) if dt != f.dataType =>
            Some(s"'${f.name}' declared ${f.dataType.sql} but the lake " +
              s"table stores ${dt.sql}")
          case _ => None
        }
      } ++ (actual.fieldNames.toSet -- schema.fieldNames.toSet)
        .toSeq.sorted.map(n => s"'$n' exists in the lake table but is " +
          "missing from the declared columns")
      require(problems.isEmpty,
        s"CREATE TABLE ${key(ident)}: declared schema contradicts the " +
          s"lake table at $path: ${problems.mkString("; ")}")
    }
    tables.put(key(ident), path)
    // MERGE-by-convention: `OPTIONS (mergeKeys 'k1,k2', mergeSeq 's')`
    // makes SQL INSERT INTO an idempotent keyed upsert instead of a
    // blind append — the only honest INSERT semantic for an SCD table
    for (ks <- opt("mergeKeys"); sq <- opt("mergeSeq"))
      mergeSpecs.put(key(ident),
        (ks.split(',').map(_.trim).toSeq, sq.trim))
    loadTable(ident)
  }

  /** SQL `ALTER TABLE … RENAME COLUMN / DROP COLUMN / ALTER COLUMN
    * TYPE` route to the lake's own schema-evolution commits (column
    * mapping, tombstoned readers, widen-on-read) — each change is one
    * OCC commit in statement order. Nested fields and structural
    * changes the lake does not support are refused loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = SparkSession.active
    val path = pathOf(ident)
    def leaf(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"nested column ${fieldNames.mkString(".")} is not alterable on " +
          "a lake table")
      fieldNames.head
    }
    changes.foreach {
      case c: TableChange.AddColumn =>
        VersionedLake.addColumn(spark, path, leaf(c.fieldNames),
          c.dataType.sql.toLowerCase)
      case c: TableChange.RenameColumn =>
        VersionedLake.renameColumn(spark, path, leaf(c.fieldNames), c.newName)
      case c: TableChange.DeleteColumn =>
        VersionedLake.dropColumn(spark, path, leaf(c.fieldNames))
      case c: TableChange.UpdateColumnType =>
        VersionedLake.widenColumn(spark, path, leaf(c.fieldNames),
          c.newDataType.sql.toLowerCase)
      // COMMENT ON TABLE arrives as SetProperty("comment") — catalog
      // metadata, not a lake commit
      case c: TableChange.SetProperty if c.property == "comment" =>
        tableComments.put(key(ident), c.value)
      case c: TableChange.RemoveProperty if c.property == "comment" =>
        tableComments.remove(key(ident))
      case other => throw new UnsupportedOperationException(
        s"ALTER change ${other.getClass.getSimpleName} is not a lake " +
          "operation (supported: RENAME COLUMN, DROP COLUMN, " +
          "ALTER COLUMN TYPE widening, COMMENT)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    mergeSpecs.remove(key(ident))
    tableComments.remove(key(ident))
    tables.remove(key(ident)) != null
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val p = pathOf(from)
    tables.put(key(to), p)
    tables.remove(key(from))
    Option(mergeSpecs.remove(key(from)))
      .foreach(mergeSpecs.put(key(to), _))
    Option(tableComments.remove(key(from)))
      .foreach(tableComments.put(key(to), _))
  }

  // -- SupportsNamespaces (permissive in-memory semantics) ------------------
  override def listNamespaces(): Array[Array[String]] =
    namespaces.asScala.toArray.map(_.split('.').toArray[String])
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Array.empty
  }
  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || namespaces.contains(ns.mkString(".")) ||
      tables.keySet().asScala.exists(_.startsWith(ns.mkString(".") + "."))
  override def loadNamespaceMetadata(
      ns: Array[String]): JMap[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val m = new java.util.HashMap[String, String]()
    Option(nsComments.get(ns.mkString("."))).foreach(m.put("comment", _))
    m
  }
  override def createNamespace(ns: Array[String],
      metadata: JMap[String, String]): Unit = {
    namespaces.add(ns.mkString("."))
    // CREATE NAMESPACE ... COMMENT 'x' arrives as metadata("comment")
    Option(metadata.get("comment"))
      .foreach(nsComments.put(ns.mkString("."), _))
  }
  /** COMMENT ON NAMESPACE routes here as a SetProperty("comment");
    * other namespace metadata stays immutable.
    */
  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit = changes.foreach {
    case c: NamespaceChange.SetProperty if c.property == "comment" =>
      nsComments.put(ns.mkString("."), c.value)
    case c: NamespaceChange.RemoveProperty if c.property == "comment" =>
      nsComments.remove(ns.mkString("."))
    case other => throw new UnsupportedOperationException(
      s"namespace metadata is immutable (got $other); only COMMENT " +
        "is mutable")
  }
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val existed = namespaceExists(ns)
    val prefix = ns.mkString(".") + "."
    val memberTables = tables.keySet().asScala.filter(_.startsWith(prefix))
      .toSeq
    val childNs = namespaces.asScala.filter(_.startsWith(prefix)).toSeq
    if (!cascade && (memberTables.nonEmpty || childNs.nonEmpty))
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(ns)
    memberTables.foreach { k =>
      tables.remove(k); mergeSpecs.remove(k); tableComments.remove(k)
    }
    volumes.keySet().asScala.filter(_.startsWith(prefix)).toSeq
      .foreach(volumes.remove)
    childNs.foreach { c => namespaces.remove(c); nsComments.remove(c) }
    namespaces.remove(ns.mkString("."))
    nsComments.remove(ns.mkString("."))
    existed
  }
}

/** One registered lake table, possibly pinned to a time-travel version.
  * Writable through SQL when the registration carried a merge spec
  * (`mergeKeys`/`mergeSeq` options): INSERT INTO routes through
  * [[VersionedLake.upsert]] — a keyed MERGE with the lake's full OCC /
  * constraint / generated-column / column-mapping machinery, not a
  * blind file append. `DELETE FROM … WHERE` implements
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]]: the
  * pushed conjuncts select the doomed keys through the stats-skipping
  * read and commit a MERGE-ON-READ position delete
  * ([[VersionedLake.dvDelete]]) — zero data files rewritten, the
  * tombstones visible to CDF and the streaming source. `MERGE INTO` is
  * rewritten by [[graft.plans.GraftMergeRule]] onto the same engine
  * primitives.
  */
private[graft] class GraftLakeTable(ident: String, val path: String,
    val asOfVersion: Option[Int],
    val mergeSpec: Option[(Seq[String], String)])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String =
    ident + asOfVersion.map(v => s"@v$v").getOrElse("")

  // computed once per loadTable (manifest decode + possibly O(#files)
  // footer reads for widened tables); Spark calls Table.schema()
  // repeatedly during analysis
  private lazy val snapshotSchema: StructType =
    VersionedLake.read(SparkSession.active, path, asOfVersion).schema
  override def schema(): StructType = snapshotSchema

  // AUTOMATIC_SCHEMA_EVOLUTION: `MERGE … WITH SCHEMA EVOLUTION` only
  // evolves when the target declares it — Spark then routes the new
  // source columns through alterTable(AddColumn) = the lake's
  // metadata-only ADD_COLUMN commit, and re-resolves the merge
  override def capabilities(): java.util.Set[TableCapability] =
    if (mergeSpec.isDefined)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE,
        TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScanBuilder(path, asOfVersion, schema())

  /** SQL `DELETE FROM … WHERE`: accept only conjunct sets the lake can
    * evaluate itself (same translation as scan pushdown) on a
    * mergeKeys-registered current-version table — Spark then calls
    * [[deleteWhere]] instead of demanding a row-level-operation plan.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    mergeSpec.isDefined && asOfVersion.isEmpty &&
      filters.forall(f =>
        f.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue] ||
          GraftLakeScanBuilder.toSql(f).isDefined)

  /** The doomed rows' KEYS come from a stats-skipping read under the
    * pushed predicate (file-level pruning before any IO), and the
    * delete itself is the MOR position-delete commit: one DV sidecar +
    * manifest, zero data-file rewrites, tombstones published to the
    * change stream. An empty filter array (SQL `DELETE FROM t`) is the
    * truncate form and deletes every current key the same way.
    */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val (keys, _) = mergeSpec.get
    val pred = filters
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
      .flatMap(GraftLakeScanBuilder.toSql)
      .map(p => s"($p)").mkString(" AND ")
    val doomed =
      if (pred.isEmpty) VersionedLake.read(spark, path, None)
      else VersionedLake.readWhere(spark, path, pred)
    VersionedLake.dvDelete(spark, path,
      doomed.select(keys.map(col): _*).distinct(), keys)
    ()
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val (keys, seq) = mergeSpec.getOrElse(throw new
        UnsupportedOperationException(
      s"$ident was registered without mergeKeys/mergeSeq OPTIONS — " +
        "SQL INSERT needs the merge contract"))
    require(asOfVersion.isEmpty, "cannot INSERT into a time-travel read")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: DataFrame, overwrite: Boolean) => {
              if (overwrite) throw new UnsupportedOperationException(
                "INSERT OVERWRITE is not a lake operation — RESTORE or " +
                  "re-create instead")
              VersionedLake.upsert(data.sparkSession, path, data, keys, seq)
              ()
            }
        }
    }
  }
}

private[sources] class GraftLakeScanBuilder(path: String,
    asOfVersion: Option[Int], full: StructType) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var countStarPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    // guard against columns the lake schema lacks (metadata internals)
    required = StructType(
      requiredSchema.fields.filter(f => full.fieldNames.contains(f.name)))

  /** Accept the conjuncts expressible as a lake predicate; they route
    * the scan through [[VersionedLake.readWhere]] (manifest-stats FILE
    * SKIPPING + exact row-level apply), so accepted filters are never
    * re-evaluated Spark-side. Everything else stays residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(f => GraftLakeScanBuilder.toSql(f).isDefined)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COMPLETE pushdown of unfiltered, ungrouped COUNT(*): the manifest
    * answers it at metadata cost ([[VersionedLake.metadataCount]] —
    * footer row counts for tombstone-free un-DV'd files, a restricted
    * scan for the rest), so the whole aggregate disappears from the
    * Spark plan. Anything else (groups, filters, other functions)
    * declines and runs as a normal scan + aggregate.
    */
  private def isPlainCountStar(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean =
    agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[
        org.apache.spark.sql.connector.expressions.aggregate.CountStar] &&
      pushed.isEmpty

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = isPlainCountStar(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    if (!isPlainCountStar(agg)) false
    else { countStarPushed = true; true }
  }

  override def build(): Scan =
    if (countStarPushed) new GraftLakeCountScan(path, asOfVersion)
    else new GraftLakeScan(path, asOfVersion, required,
      pushed.flatMap(GraftLakeScanBuilder.toSql))
}

private[sources] object GraftLakeScanBuilder {
  private def ident(c: String): Option[String] =
    if (c.matches("[A-Za-z_][A-Za-z0-9_]*")) Some(c) else None
  private def num(v: Any): Option[String] = v match {
    case _: Int | _: Long | _: Short | _: Byte => Some(v.toString)
    // shortest-repr doubles round-trip exactly through the SQL parser
    // (decimal literal -> double cast recovers the identical double).
    // FLOATS DO NOT: the column widens to double (0.3f ->
    // 0.30000001192...) while the rendered literal parses as 0.3, so a
    // pushed float comparison would silently change results — floats
    // stay residual.
    case d: Double if !d.isNaN && !d.isInfinite => Some(d.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case _ => None
  }
  /** The subset of source filters the lake's predicate reader speaks. */
  def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => for (c <- ident(a); n <- num(v)) yield s"$c = $n"
    case GreaterThan(a, v) =>
      for (c <- ident(a); n <- num(v)) yield s"$c > $n"
    case GreaterThanOrEqual(a, v) =>
      for (c <- ident(a); n <- num(v)) yield s"$c >= $n"
    case LessThan(a, v) =>
      for (c <- ident(a); n <- num(v)) yield s"$c < $n"
    case LessThanOrEqual(a, v) =>
      for (c <- ident(a); n <- num(v)) yield s"$c <= $n"
    case IsNotNull(a) => ident(a).map(c => s"$c IS NOT NULL")
    case _ => None
  }
}

/** The scan as a [[V1Scan]]: Spark plans it as a RowDataSourceScan
  * whose rows come from the lake's own DataFrame — one MOR read path,
  * no drift.
  */
private[sources] class GraftLakeScan(path: String, asOfVersion: Option[Int],
    required: StructType, predicates: Array[String]) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftLakeRelation(context, path, asOfVersion, required, predicates)
      .asInstanceOf[T]

  override def description(): String =
    s"GraftLake(path=$path, asOf=$asOfVersion, " +
      s"predicates=${predicates.mkString(" AND ")})"
}

private[sources] class GraftLakeRelation(ctx: SQLContext, path: String,
    asOfVersion: Option[Int], requiredSchema: StructType,
    predicates: Array[String]) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = requiredSchema

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    val base =
      if (predicates.isEmpty) VersionedLake.read(spark, path, asOfVersion)
      else VersionedLake.readWhere(spark, path,
        predicates.mkString(" AND "), asOfVersion)
    val projected =
      if (requiredSchema.isEmpty) base.select() // COUNT(*) prune
      else base.select(requiredSchema.fieldNames.map(col).toSeq: _*)
    projected.rdd
  }
}

/** An Iceberg-style METADATA TABLE over a registered lake table:
  * `ns.t.history` (version, operation, commit_ts — DESCRIBE HISTORY as
  * a relation) and `ns.t.tags` (tag_name, version). Metadata-scale by
  * construction: both read manifests, never data.
  */
private[sources] object GraftStagedTable {
  sealed trait Mode
  case object Create extends Mode
  case object Replace extends Mode
  case object CreateOrReplace extends Mode
}

/** Atomic CTAS / RTAS for the lake catalog. The V1 write buffers the
  * query's DataFrame (nothing executes at write-build time);
  * `commitStagedChanges` then lands EVERYTHING — data as the lake
  * commit, name + merge contract in the catalog — so the statement is
  * all-or-nothing:
  *
  *  - CREATE … AS SELECT: the location must hold no committed lake
  *    versions; the query lands as version 1 via
  *    [[VersionedLake.upsert]] and the name registers only after the
  *    commit. On ANY failure Spark calls `abortStagedChanges`, which
  *    deletes the (previously version-free) location wholesale — the
  *    engine-asserted NO-ORPHAN path: a failed CTAS leaves neither a
  *    name nor a file.
  *  - REPLACE … AS SELECT: one [[VersionedLake.replaceSnapshot]]
  *    commit (op REPLACE) on the EXISTING chain — content swaps,
  *    history stays time-travelable, properties carry. A failure
  *    aborts without touching the live chain (the worst case is
  *    adopted-but-unreferenced files, which vacuum sweeps).
  *
  * LOCATION is optional for CREATE: a managed path derives from
  * `spark.graft.warehouse` (default `<java.io.tmpdir>/graft_warehouse`)
  * and the table name. The merge contract
  * (`OPTIONS (mergeKeys …, mergeSeq …)`) is REQUIRED on create — lake
  * content is keyed — and carries over on replace when omitted.
  */
private[sources] class GraftStagedTable(cat: GraftLakeCatalog,
    ident: Identifier, declared: StructType,
    properties: JMap[String, String], mode: GraftStagedTable.Mode)
    extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import GraftStagedTable._

  private val props = properties.asScala
  private def opt(k: String): Option[String] =
    props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))

  private val identKey = cat.identKeyOf(ident)

  private def stripScheme(loc: String): String = {
    val uri = try new java.net.URI(loc) catch {
      case _: java.net.URISyntaxException => null
    }
    if (uri != null && uri.getScheme == "file") uri.getPath else loc
  }

  private lazy val path: String = cat.registeredPath(identKey) match {
    case Some(p) =>
      opt("location").orElse(opt("path")).map(stripScheme).foreach(l =>
        require(l == p, s"REPLACE TABLE $identKey: LOCATION '$l' " +
          s"contradicts the registered path '$p'"))
      p
    case None => opt("location").orElse(opt("path")).map(stripScheme)
      .getOrElse {
        val wh = SparkSession.active.conf.get("spark.graft.warehouse",
          s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
        s"$wh/${identKey.replace('.', '/')}"
      }
  }

  private val declaredSpec: Option[(Seq[String], String)] =
    for (ks <- opt("mergeKeys"); sq <- opt("mergeSeq"))
      yield (ks.split(',').map(_.trim).toSeq, sq.trim)

  private var pending: Option[DataFrame] = None
  private var freshLocation = false

  override def name(): String = identKey
  override def schema(): StructType = declared
  // TRUNCATE: Spark's RTAS exec expresses the staged write as
  // OverwriteByExpression(true) over the staged relation — the
  // capability gates analysis only; the actual replace is ONE
  // replaceSnapshot commit in commitStagedChanges
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    // SupportsTruncate: RTAS's OverwriteByExpression(true) calls
    // truncate() on the builder; the "truncate" IS the replace commit,
    // so the builder just accepts it and keeps buffering
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: DataFrame, _: Boolean) => { pending = Some(data); () }
        }
    }

  override def commitStagedChanges(): Unit = {
    val spark = SparkSession.active
    val (keys, seq) = declaredSpec
      .orElse(cat.mergeSpecOf(identKey)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE/REPLACE TABLE $identKey AS SELECT needs " +
            "OPTIONS (mergeKeys '…', mergeSeq '…') — lake content is " +
            "keyed (the contract every write surface shares)"))
    val df = pending.getOrElse(
      spark.createDataFrame(new java.util.ArrayList[Row](), declared))
    for (c <- keys :+ seq)
      require(df.columns.contains(c),
        s"CTAS/RTAS on $identKey: merge column '$c' is missing from " +
          s"the query output (has: ${df.columns.mkString(", ")})")
    val replacing = mode != Create && cat.isRegistered(identKey) &&
      VersionedLake.versions(spark, path).nonEmpty
    if (mode == Replace && !replacing)
      throw new NoSuchTableException(ident)
    if (!replacing) {
      require(VersionedLake.versions(spark, path).isEmpty,
        s"CREATE TABLE $identKey AS SELECT at $path: the location " +
          "already holds committed lake versions — REPLACE the table " +
          "or register the existing data with plain CREATE TABLE")
      freshLocation = true
      VersionedLake.upsert(spark, path, df, keys, seq)
    } else
      VersionedLake.replaceSnapshot(spark, path, df, keys, seq)
    cat.register(identKey, path,
      declaredSpec.orElse(cat.mergeSpecOf(identKey)))
  }

  override def abortStagedChanges(): Unit =
    // only a location THIS statement introduced is deleted — an abort
    // must never take pre-existing data with it
    if (freshLocation) {
      val spark = SparkSession.active
      val f = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(path), true)
      ()
    }
}

/** `ns.t.changes` — the lake table's change feed as a named STREAMING
  * relation. Declares MICRO_BATCH_READ so analysis accepts it in
  * `spark.readStream.table(...)`; the actual plan never reaches this
  * table's scan builder — [[CdfSql.ResolveLakeStreams]] rewrites the
  * streaming relation onto [[VersionedLake.streamChanges]]' file
  * stream (Spark's own file-stream source then owns offsets,
  * checkpointing, and exactly-once delivery). The scan builder throws
  * with instructions rather than half-working without the extension.
  */
private[graft] class GraftLakeChangesTable(ident: String,
    val path: String) extends Table with SupportsRead {

  override def name(): String = s"$ident.changes"

  private lazy val changeSchema: StructType =
    VersionedLake.streamChanges(SparkSession.active, path).schema
  override def schema(): StructType = changeSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      s"$ident.changes resolves through graft.GraftExtensions " +
        "(spark.sql.extensions) — register the extension to stream " +
        "the change feed by name")
}

private[sources] class GraftLakeMetaTable(ident: String, path: String,
    meta: String, comment: () => Option[String] = () => None)
    extends Table with SupportsRead {
  import org.apache.spark.sql.types.{LongType, IntegerType, StringType,
    StructField}

  override def name(): String = s"$ident.$meta"

  override def schema(): StructType = meta match {
    case "history" => StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("commit_ts", LongType, nullable = false)))
    case "tags" => StructType(Seq(
      StructField("tag_name", StringType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    // `ns.t.describe` — catalog metadata (COMMENT, location, format)
    // as a relation, the SHOW/DESCRIBE introspection surface
    case "describe" => StructType(Seq(
      StructField("prop_key", StringType, nullable = false),
      StructField("prop_value", StringType, nullable = true)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", IntegerType, nullable = false),
      StructField("base_version", IntegerType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("file_count", LongType, nullable = false),
      StructField("record_count", LongType, nullable = true),
      StructField("dv_file_count", LongType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("bucket", IntegerType, nullable = false),
      StructField("record_count", LongType, nullable = true),
      StructField("dv_row_count", LongType, nullable = false),
      StructField("bounds", StringType, nullable = true)))
    case "snapshots" => StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("commit_ts", LongType, nullable = false),
      StructField("files_added", LongType, nullable = false),
      StructField("files_removed", LongType, nullable = false),
      StructField("record_count", LongType, nullable = true)))
    // the table's own rows plus the tracked identity — schema is the
    // LIVE logical schema + row_id, so it must be computed, not pinned
    case "rows" =>
      VersionedLake.readWithRowIds(SparkSession.active, path).schema
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = { () =>
    new V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        val relSchema = readSchema()
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = relSchema
          override def buildScan(): RDD[Row] = {
            val spark = context.sparkSession
            val df = meta match {
              case "history" => VersionedLake.history(spark, path)
              case "tags" =>
                import spark.implicits._
                VersionedLake.tags(spark, path).toSeq.sorted
                  .toDF("tag_name", "version")
              case "describe" =>
                import spark.implicits._
                (Seq(("comment", comment().orNull),
                  ("format", "graft-lake"),
                  ("location", path))
                  : Seq[(String, String)]).toDF("prop_key", "prop_value")
              case "refs" => VersionedLake.refsMeta(spark, path)
              case "partitions" =>
                VersionedLake.partitionsMeta(spark, path)
              case "files" => VersionedLake.filesMeta(spark, path)
              case "snapshots" => VersionedLake.snapshotsMeta(spark, path)
              case "rows" => VersionedLake.readWithRowIds(spark, path)
            }
            df.select(relSchema.fieldNames.map(col).toSeq: _*).rdd
          }
        }.asInstanceOf[T]
      }
    }
  }
}

/** `ns.volumes` — the namespace's registered volumes as an ordinary
  * relation (name, location): the SHOW VOLUMES / DESCRIBE VOLUME
  * introspection surface over [[GraftLakeCatalog]]'s volume registry.
  * Volume inventories are metadata-scale, so the scan is a driver-side
  * snapshot taken at scan time (`rows()` re-reads the registry, so a
  * CALL create_volume in the same session is immediately visible).
  */
private[sources] class GraftVolumesTable(ns: String,
    rows: () => Seq[(String, String, String)])
    extends Table with SupportsRead {
  import org.apache.spark.sql.types.{StringType, StructField}

  override def name(): String = s"$ns.volumes"

  override def schema(): StructType = StructType(Seq(
    StructField("namespace", StringType, nullable = false),
    StructField("volume_name", StringType, nullable = false),
    StructField("location", StringType, nullable = false)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = { () =>
    new V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        val relSchema = readSchema()
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = relSchema
          override def buildScan(): RDD[Row] = {
            val spark = context.sparkSession
            import spark.implicits._
            rows().toDF("namespace", "volume_name", "location").rdd
          }
        }.asInstanceOf[T]
      }
    }
  }
}

/** A completely-pushed COUNT(*): one BIGINT row, computed from the
  * manifest's `__meta` row counts plus a scan of only the files whose
  * liveness metadata cannot prove (DV-carrying or tombstone-possible),
  * falling back to a full live count for pre-`__meta` tables — always
  * exact, metadata-cheap when the table allows it.
  */
private[sources] class GraftLakeCountScan(path: String,
    asOfVersion: Option[Int]) extends V1Scan {

  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count_star",
      org.apache.spark.sql.types.LongType, nullable = false)))

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val relSchema = readSchema()
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = relSchema
      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession
        val n = VersionedLake.metadataCount(spark, path, asOfVersion)
          .getOrElse(VersionedLake.read(spark, path, asOfVersion).count())
        spark.sparkContext.parallelize(Seq(Row(n)), 1)
      }
    }.asInstanceOf[T]
  }

  override def description(): String =
    s"GraftLakeCount(path=$path, asOf=$asOfVersion)"
}

/** Gate registration for the SQL surface. */
object SqlCatalog {
  import org.apache.spark.sql.functions._

  val CatalogName = "graft_lake"

  /** Install the catalog plugin on the session (idempotent). */
  def install(spark: SparkSession): Unit =
    spark.conf.set(s"spark.sql.catalog.$CatalogName",
      classOf[GraftLakeCatalog].getName)

  /** SQL surface as a gate row: a lake table built through the engine
    * API (COW + MOR trickle commits) is registered ONCE under a catalog
    * name and then consumed entirely through `spark.sql`:
    *
    *  - the snapshot query resolves the bare name (no path, no API)
    *    and hash-matches the full-feed SCD1 oracle;
    *  - `VERSION AS OF 1` resolves the pinned manifest — its row count
    *    must equal the first-half winners, which the oracle computes
    *    from the same sequence cutoff (`n_v1_rows`);
    *  - a WHERE conjunct is accepted by the connector
    *    (`filters_pushed`, read from the executed plan's PushedFilters)
    *    and routes the scan through the lake's stats-skipping read.
    */
  def sqlRead(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlcat")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvUpsert(spark, path,
      asChanges(staged.filter(col("sequence_number") > t1)),
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_scd"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    val v1n = spark.sql(s"SELECT COUNT(*) AS n FROM $t VERSION AS OF 1")
      .head().getLong(0)
    val filtered = spark.sql(
      s"SELECT key_id FROM $t WHERE key_id >= 100")
    val planStr = filtered.queryExecution.executedPlan.toString
    val filtersPushed = planStr.contains("PushedFilters") &&
      planStr.contains("GreaterThanOrEqual(key_id,100)")
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("n_v1_rows", lit(v1n))
      .withColumn("filters_pushed", lit(filtersPushed))
  }

  val sqlReadSql: String =
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
       v1n AS (
         SELECT COUNT(*) AS n FROM r1
         WHERE rn = 1 AND operation <> 'DELETE'),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         (SELECT n FROM v1n) AS n_v1_rows, true AS filters_pushed
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** SQL WRITE surface as a gate row: the second half of the change
    * feed lands through `INSERT INTO` — which the catalog routes into
    * [[VersionedLake.upsert]] because the registration carried
    * `mergeKeys`/`mergeSeq` OPTIONS, so SQL writers get the keyed
    * MERGE (OCC, constraints, column mapping) rather than an append.
    * DELETE events cannot be expressed through bare INSERT (no
    * `_deleted` in the public schema), so the SQL feed carries only
    * non-delete changes and the oracle mirrors exactly that contract;
    * INSERT OVERWRITE is refused (`overwrite_refused`) and the insert
    * commits exactly one version (`sql_insert_committed`).
    */
  def sqlWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlw")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    VersionedLake.upsert(spark, path,
      staged.filter(col("sequence_number") <= t1)
        .withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation"),
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_w"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    staged.filter(col("sequence_number") > t1 &&
      col("operation") =!= "DELETE")
      .createOrReplaceTempView("sqlw_feed")
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"""INSERT INTO $t BY NAME
      SELECT key_id, value, props, sequence_number FROM sqlw_feed""")
    val committedOne = VersionedLake.versions(spark, path).last == before + 1
    val overwriteRefused =
      try {
        spark.sql(s"""INSERT OVERWRITE TABLE $t BY NAME
          SELECT key_id, value, props, sequence_number FROM sqlw_feed""")
        false
      } catch { case _: Exception => true }
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("sql_insert_committed", lit(committedOne))
      .withColumn("overwrite_refused", lit(overwriteRefused))
  }

  val sqlWriteSql: String =
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
       feed AS (
         SELECT s.* FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1
            OR (s.sequence_number > c.t1 AND s.operation <> 'DELETE')),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM feed s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         true AS sql_insert_committed, true AS overwrite_refused
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** CTAS / RTAS as a gate row (the atomic [[GraftStagedTable]] path):
    * CREATE TABLE … AS SELECT lands the first half of the change feed
    * as version 1 AND registers the name in one statement; a CTAS
    * whose query fails at write time must leave NEITHER a name NOR a
    * file (`ctas_fail_no_orphan`, probed with a raise_error() query on
    * a fresh location); REPLACE TABLE … AS SELECT swaps in the
    * full-feed content as ONE `op REPLACE` commit
    * (`rtas_one_commit`) while version 1 stays time-travelable and
    * bit-identical (`rtas_history_preserved`, engine-compared with a
    * two-way exceptAll). The final state converges to the same
    * full-feed SCD1 winners the sqlRead oracle computes — every
    * reference pipeline table is effectively this CTAS shape (ref
    * src/pipelines/silver/orders.sql).
    */
  def sqlCtas(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_ctas")
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(path), true) // CTAS wants fresh
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    val t = s"$CatalogName.lakehouse.events_ctas"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    asChanges(staged.filter(col("sequence_number") <= t1))
      .createOrReplaceTempView("ctas_feed_half")
    spark.sql(s"""CREATE TABLE $t
      USING graft OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'
      AS SELECT key_id, value, props, sequence_number, _deleted
         FROM ctas_feed_half""")
    val ctasV1 = VersionedLake.versions(spark, path) == Seq(1)
    // no-orphan failure path: a CTAS that dies mid-write on a FRESH
    // location must leave neither a registered name nor a directory
    val failPath = Scratch.dir("vlake_ctas_fail")
    f.delete(new org.apache.hadoop.fs.Path(failPath), true)
    val tf = s"$CatalogName.lakehouse.events_ctas_fail"
    spark.sql(s"DROP TABLE IF EXISTS $tf")
    val failed = try {
      spark.sql(s"""CREATE TABLE $tf
        USING graft OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
        LOCATION '$failPath'
        AS SELECT key_id, raise_error('ctas gate probe') AS value,
           props, sequence_number, _deleted FROM ctas_feed_half""")
      false
    } catch { case scala.util.control.NonFatal(_) => true }
    val noOrphan = failed &&
      !spark.catalog.tableExists(tf) &&
      !f.exists(new org.apache.hadoop.fs.Path(failPath))
    // RTAS: replace with the FULL feed's resolved content, one commit,
    // history preserved
    val v1Snapshot = VersionedLake.read(spark, path, Some(1))
      .localCheckpoint(true)
    asChanges(staged).createOrReplaceTempView("ctas_feed_all")
    spark.sql(s"""REPLACE TABLE $t
      USING graft OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      AS SELECT key_id, value, props, sequence_number, _deleted
         FROM ctas_feed_all""")
    val rtasOneCommit = VersionedLake.versions(spark, path) == Seq(1, 2)
    val v1After = VersionedLake.read(spark, path, Some(1))
    val historyPreserved = graft.Dist.multisetEqual(v1After, v1Snapshot)
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("ctas_committed_v1", lit(ctasV1))
      .withColumn("ctas_fail_no_orphan", lit(noOrphan))
      .withColumn("rtas_one_commit", lit(rtasOneCommit))
      .withColumn("rtas_history_preserved", lit(historyPreserved))
  }

  val sqlCtasSql: String =
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
         true AS ctas_committed_v1, true AS ctas_fail_no_orphan,
         true AS rtas_one_commit, true AS rtas_history_preserved
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** `ns.t.files` + `ns.t.snapshots` — the Iceberg metadata-table
    * family completed (pattern: history/tags/partitions). The fixture
    * commits a COW merge, a MOR trickle (`key_id % 5`, boosted
    * sequences) and a pure position-delete (`key_id % 9`), then
    * engine-asserts the structural invariants the VERDICT asks for:
    *
    *  - Σ files.record_count == snapshots(tip).record_count
    *    (`files_sum_matches_snapshot`);
    *  - files aggregated per bucket == the partitions metadata table,
    *    row for row (`files_match_partitions`);
    *  - snapshot chain folds: Σ (files_added − files_removed) over
    *    versions == live file count at tip, the DELETE version adds
    *    and removes zero files, and every dv_row_count ≤ record_count
    *    (`snapshot_chain_sane`).
    *
    * The emitted rows are the snapshots table's (version, operation)
    * chain — deterministic from the construction — with the
    * oracle-recomputed physical-row and DV-row totals.
    */
  def sqlFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlfiles")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val live = staged.filter(col("operation") =!= "DELETE")
      .drop("operation")
    VersionedLake.upsert(spark, path, live,
      Seq("key_id"), "sequence_number")
    VersionedLake.dvUpsert(spark, path,
      live.filter(pmod(col("key_id"), lit(5)) === 0)
        .withColumn("sequence_number", col("sequence_number") + maxSeq),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvDelete(spark, path,
      live.select(col("key_id")).distinct()
        .filter(pmod(col("key_id"), lit(9)) === 0), Seq("key_id"))
    install(spark)
    val t = s"$CatalogName.lakehouse.events_files"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    val files = spark.table(s"$t.files").localCheckpoint(true)
    val snaps = spark.table(s"$t.snapshots").localCheckpoint(true)
    val filesSum = files.agg(sum(col("record_count"))).head().getLong(0)
    val dvSum = files.agg(sum(col("dv_row_count"))).head().getLong(0)
    val tipRecords = snaps.orderBy(col("version").desc).head()
      .getAs[Long]("record_count")
    val sumMatches = filesSum == tipRecords
    val fromFiles = files.groupBy(col("bucket")).agg(
      count(lit(1)).as("file_count"),
      sum(col("record_count")).as("record_count"),
      sum(when(col("dv_row_count") > 0, 1L).otherwise(0L))
        .as("dv_file_count"))
    val parts = spark.table(s"$t.partitions")
    val partitionsMatch = graft.Dist.multisetEqual(fromFiles, parts)
    val snapRows = snaps.orderBy(col("version")).collect()
    val folded = snapRows.map(r =>
      r.getAs[Long]("files_added") - r.getAs[Long]("files_removed")).sum
    val deleteRow = snapRows.find(_.getAs[String]("operation") == "DELETE")
    val chainSane = folded == files.count() &&
      deleteRow.exists(r => r.getAs[Long]("files_added") == 0L &&
        r.getAs[Long]("files_removed") == 0L) &&
      files.filter(col("dv_row_count") > col("record_count")).isEmpty
    snaps.select(col("version"), col("operation"))
      .withColumn("n_physical_rows", lit(filesSum))
      .withColumn("n_dv_rows", lit(dvSum))
      .withColumn("files_sum_matches_snapshot", lit(sumMatches))
      .withColumn("files_match_partitions", lit(partitionsMatch))
      .withColumn("snapshot_chain_sane", lit(chainSane))
  }

  val sqlFilesSql: String =
    """WITH stg AS (
         SELECT user_id AS key_id,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       live AS (SELECT DISTINCT key_id FROM stg WHERE operation <> 'DELETE'),
       tot AS (
         SELECT CAST((SELECT COUNT(*) FROM live)
             + (SELECT COUNT(*) FROM live WHERE key_id % 5 = 0) AS BIGINT)
             AS n_physical_rows,
           CAST((SELECT COUNT(*) FROM live WHERE key_id % 5 = 0)
             + (SELECT COUNT(*) FROM live WHERE key_id % 9 = 0) AS BIGINT)
             AS n_dv_rows)
       SELECT v.version, v.operation, t.n_physical_rows, t.n_dv_rows,
         true AS files_sum_matches_snapshot,
         true AS files_match_partitions,
         true AS snapshot_chain_sane
       FROM (VALUES (1, 'MERGE'), (2, 'MERGE_MOR'), (3, 'DELETE'))
         AS v(version, operation), tot t
       ORDER BY v.version"""

  /** EXPECTATIONS as SQL DDL — the reference's signature clause on a
    * lake table, end to end:
    *
    *  - `ALTER TABLE t ADD CONSTRAINT valid_value EXPECT (value IS NOT
    *    NULL) ON VIOLATION DROP ROW` (the silver/order_items.sql
    *    shape) stores the rule as a table property; the next SQL
    *    INSERT of a DIRTIED batch (value nulled for `key_id % 3 = 0`)
    *    lands ONLY the clean rows, drops the violators into the
    *    per-version quarantine, and stamps per-rule `meta expect`
    *    metrics — `metrics_match` (metric == quarantine row count) and
    *    `quarantine_rows_match` (quarantine content == exactly the
    *    dirtied rows, two-way exceptAll) are engine-asserted;
    *  - `… ON VIOLATION FAIL UPDATE` (the gold/monthly_orders.sql
    *    shape) is the CHECK-constraint mode: a violating batch is
    *    rejected WHOLESALE and atomically
    *    (`fail_update_wholesale`: version chain unchanged).
    *
    * The emitted rows are the final table state — first third (full
    * feed) merged with the clean survivors of the dirty second third —
    * which the oracle recomputes from the same cutoffs.
    */
  def sqlExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_expect")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    val t = s"$CatalogName.lakehouse.events_exp"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    spark.sql(s"""ALTER TABLE $t ADD CONSTRAINT valid_value
      EXPECT (value IS NOT NULL) ON VIOLATION DROP ROW""")
    spark.sql(s"""ALTER TABLE $t ADD CONSTRAINT valid_seq
      EXPECT (sequence_number >= 0) ON VIOLATION FAIL UPDATE""")
    val ddlCommitted = VersionedLake.versions(spark, path) == Seq(1, 2, 3)
    // the dirty batch: second-third non-delete changes, value nulled
    // for every key_id % 3 == 0 row
    val feed2 = staged.filter(col("sequence_number") > t1 &&
        col("sequence_number") <= t2 && col("operation") =!= "DELETE")
      .withColumn("value", when(pmod(col("key_id"), lit(3)) === 0,
        lit(null).cast("double")).otherwise(col("value")))
      .localCheckpoint(true) // reused: insert + expected-quarantine
    feed2.createOrReplaceTempView("exp_feed2")
    spark.sql(s"""INSERT INTO $t BY NAME
      SELECT key_id, value, props, sequence_number FROM exp_feed2""")
    val vIns = VersionedLake.versions(spark, path).last
    val quarantine = VersionedLake.quarantined(spark, path, vIns)
      .localCheckpoint(true)
    val nQuar = quarantine.count()
    val metric = VersionedLake.expectationMetrics(spark, path)
      .filter(col("version") === vIns && col("rule") === "valid_value")
      .head().getLong(2)
    val metricsMatch = metric == nQuar &&
      quarantine.filter(col("_expect_failed") =!= "valid_value").isEmpty
    val expectedQuar = feed2.filter(col("value").isNull)
      .select(col("key_id"), col("props"), col("sequence_number"))
    val actualQuar = quarantine
      .select(col("key_id"), col("props"), col("sequence_number"))
    val quarantineMatch = graft.Dist.multisetEqual(expectedQuar, actualQuar)
    // FAIL UPDATE: a batch breaking the CHECK half rejects wholesale
    val before = VersionedLake.versions(spark, path)
    staged.filter(col("sequence_number") > t2 &&
        col("operation") =!= "DELETE").limit(50)
      .withColumn("sequence_number", -col("sequence_number"))
      .createOrReplaceTempView("exp_feed_bad")
    val failWholesale = (try {
      spark.sql(s"""INSERT INTO $t BY NAME
        SELECT key_id, value, props, sequence_number FROM exp_feed_bad""")
      false
    } catch { case scala.util.control.NonFatal(_) => true }) &&
      VersionedLake.versions(spark, path) == before
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("n_quarantined", lit(nQuar))
      .withColumn("expectation_ddl_committed", lit(ddlCommitted))
      .withColumn("metrics_match", lit(metricsMatch))
      .withColumn("quarantine_rows_match", lit(quarantineMatch))
      .withColumn("fail_update_wholesale", lit(failWholesale))
  }

  val sqlExpectationsSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cut AS (SELECT MAX(sequence_number) // 3 AS t1,
                      MAX(sequence_number) * 2 // 3 AS t2 FROM stg),
       nq AS (
         SELECT COUNT(*) AS n FROM stg, cut
         WHERE sequence_number > t1 AND sequence_number <= t2
           AND operation <> 'DELETE' AND key_id % 3 = 0),
       feed AS (
         SELECT s.* FROM stg s, cut c
         WHERE s.sequence_number <= c.t1
            OR (s.sequence_number > c.t1 AND s.sequence_number <= c.t2
                AND s.operation <> 'DELETE' AND s.key_id % 3 <> 0)),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM feed s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         (SELECT n FROM nq) AS n_quarantined,
         true AS expectation_ddl_committed, true AS metrics_match,
         true AS quarantine_rows_match, true AS fail_update_wholesale
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** AGGREGATE PUSHDOWN through the SQL surface: an unfiltered
    * `SELECT COUNT(*)` over a lake table COMPLETE-pushes into the
    * connector — the executed plan carries NO aggregate node (engine-
    * asserted, the [[GenSource]] complete-push discipline) — and is
    * answered by [[VersionedLake.metadataCount]]: footer row counts
    * for tombstone-free un-DV'd files, a scan of exactly the
    * DV-carrying files for the rest (the gate trickles position
    * deletes first so BOTH paths execute). `meta_count_matches` pins
    * the metadata path against the pushed SQL answer, and the oracle
    * recomputes the live count from the feed.
    */
  def sqlAggPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlagg")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    VersionedLake.upsert(spark, path,
      staged.filter(col("sequence_number") <= t1 &&
        col("operation") =!= "DELETE").drop("operation"),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvDelete(spark, path,
      staged.filter(pmod(col("key_id"), lit(7)) === 0)
        .select(col("key_id")).distinct(), Seq("key_id"))
    install(spark)
    val t = s"$CatalogName.lakehouse.events_cnt"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM $t")
    val plan = q.queryExecution.executedPlan.toString
    val noAggNode = !plan.contains("HashAggregate") &&
      !plan.contains("SortAggregate") && !plan.contains("ObjectHashAggregate")
    val n = q.head().getLong(0)
    val metaMatches =
      VersionedLake.metadataCount(spark, path).contains(n)
    spark.range(1).select(lit(n).as("n"),
      lit(noAggNode).as("agg_pushed_complete"),
      lit(metaMatches).as("meta_count_matches"))
  }

  val sqlAggPushdownSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cutoff AS (SELECT MAX(sequence_number) // 2 AS t1 FROM stg),
       k AS (
         SELECT DISTINCT key_id FROM stg, cutoff c
         WHERE sequence_number <= c.t1 AND operation <> 'DELETE')
       SELECT CAST(COUNT(*) AS BIGINT) AS n,
         true AS agg_pushed_complete, true AS meta_count_matches
       FROM k WHERE key_id % 7 <> 0"""

  /** METADATA TABLES as a gate row: a table is driven through all four
    * commit paths (COW MERGE, MOR MERGE, position DELETE, CREATE_TAG)
    * and then its audit surfaces are read as ORDINARY SQL RELATIONS —
    * `ns.t.history` and `ns.t.tags`, the Iceberg metadata-table form.
    * The operation sequence and the tag table are fully determined by
    * the driven commits, so the oracle is the literal expected
    * relation; commit_ts is wall clock and excluded. Both reads are
    * metadata-scale (manifests only, never data).
    */
  def sqlMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlmeta")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      .filter(pmod(col("key_id"), lit(4)) === 0)
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvUpsert(spark, path,
      asChanges(staged.filter(col("sequence_number") > t1)),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvDelete(spark, path,
      staged.select(col("key_id")).distinct()
        .filter(pmod(col("key_id"), lit(8)) === 0), Seq("key_id"))
    VersionedLake.createTag(spark, path, "baseline", version = 1)
    install(spark)
    val t = s"$CatalogName.lakehouse.events_meta"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    spark.sql(s"""SELECT 'history' AS src, version, operation AS name
        FROM $t.history
      UNION ALL
      SELECT 'tag', version, tag_name FROM $t.tags""")
  }

  val sqlMetadataSql: String =
    """SELECT * FROM (VALUES
         ('history', 1, 'MERGE'),
         ('history', 2, 'MERGE_MOR'),
         ('history', 3, 'DELETE'),
         ('history', 4, 'CREATE_TAG'),
         ('tag', 1, 'baseline')) AS t(src, version, name)
       ORDER BY src, version"""

  /** SQL `MERGE INTO` as a gate row: the first half of the change feed
    * builds the table through the engine API; the second half — deduped
    * to latest-change-per-key, the standard MERGE staging contract —
    * lands through one SQL MERGE statement with all three clause kinds
    * (MATCHED+DELETE, MATCHED+UPDATE, NOT MATCHED+conditional INSERT).
    * [[graft.plans.GraftMergeRule]] lowers the statement onto a single
    * [[VersionedLake.upsert]] commit (`sql_merge_committed` pins exactly
    * one new version), and the result must hash-match the FULL-feed SCD1
    * oracle — convergence, the AUTO CDC semantics
    * (ref /root/reference/src/pipelines/cdc/cdc_customers_silver.sql).
    * `cardinality_enforced` pins the SQL MERGE error contract: a source
    * with two rows for one matched target key must throw, not pick one.
    */
  def sqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val path = Scratch.dir("vlake_sqlmerge")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    VersionedLake.upsert(spark, path,
      staged.filter(col("sequence_number") <= t1)
        .withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation"),
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_m"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    staged.filter(col("sequence_number") > t1)
      .withColumn("_rn", row_number().over(Window.partitionBy(col("key_id"))
        .orderBy(col("sequence_number").desc)))
      .filter(col("_rn") === 1).drop("_rn")
      .createOrReplaceTempView("sqlm_feed")
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"""MERGE INTO $t AS tgt USING sqlm_feed AS src
      ON tgt.key_id = src.key_id
      WHEN MATCHED AND src.operation = 'DELETE' THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = src.value, props = src.props,
        sequence_number = src.sequence_number
      WHEN NOT MATCHED AND src.operation <> 'DELETE' THEN
        INSERT (key_id, value, props, sequence_number)
        VALUES (src.key_id, src.value, src.props, src.sequence_number)""")
    val committedOne = VersionedLake.versions(spark, path).last == before + 1
    // the SQL cardinality contract: a duplicated source key must error
    // (the duplicated key must EXIST in the target for the pairs to
    // collide, so take one from the table itself)
    val aKey = spark.sql(s"SELECT key_id FROM $t LIMIT 1").head().getLong(0)
    staged.filter(col("sequence_number") > t1).limit(2)
      .select(lit(aKey).as("key_id"), col("value"), col("props"),
        col("sequence_number"))
      .createOrReplaceTempView("sqlm_dup")
    val cardinalityEnforced =
      try {
        spark.sql(s"""MERGE INTO $t AS tgt USING sqlm_dup AS src
          ON tgt.key_id = src.key_id
          WHEN MATCHED THEN UPDATE SET value = src.value""")
        false
      } catch { case _: Exception => true }
    // MERGE WITH SCHEMA EVOLUTION: a source batch carrying a column
    // the target lacks ADDs it through the lake's metadata-only
    // ADD_COLUMN commit, then merges by name — version chain +2, the
    // evolved column lands on the touched keys, every other row reads
    // NULL, and the pre-evolution snapshot doesn't show the column
    val beforeEvo = VersionedLake.versions(spark, path).last
    spark.sql(s"SELECT key_id, sequence_number FROM $t " +
        "ORDER BY key_id LIMIT 2")
      .withColumn("note", concat(lit("evo:"), col("key_id")))
      .createOrReplaceTempView("sqlm_evo_feed")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt
      USING sqlm_evo_feed AS src ON tgt.key_id = src.key_id
      WHEN MATCHED THEN UPDATE SET note = src.note""")
    val evoOps = VersionedLake.history(spark, path).orderBy("version")
      .collect().map(_.getString(1)).toSeq.takeRight(2)
    val evolutionOk =
      VersionedLake.versions(spark, path).last == beforeEvo + 2 &&
        evoOps == Seq("ADD_COLUMN", "MERGE") &&
        spark.sql(s"SELECT COUNT(*) FROM $t WHERE note IS NOT NULL")
          .head().getLong(0) == 2L &&
        !spark.sql(s"SELECT * FROM $t VERSION AS OF $beforeEvo")
          .columns.contains("note")
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("sql_merge_committed", lit(committedOne))
      .withColumn("cardinality_enforced", lit(cardinalityEnforced))
      .withColumn("schema_evolution_ok", lit(evolutionOk))
  }

  val sqlMergeSql: String =
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
         true AS sql_merge_committed, true AS cardinality_enforced,
         true AS schema_evolution_ok
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** ROW TRACKING spoken entirely in SQL, as a gate row:
    * `CALL system.enable_row_tracking(t)` backfills identities,
    * `SELECT key_id, row_id FROM t.rows` reads them (the metadata
    * table whose schema is the LIVE logical schema + `row_id`), a SQL
    * `MERGE INTO` updates/deletes/inserts through the tracked write
    * path, and `CALL system.optimize(t)` rewrites the layout — with
    * the emitted booleans pinning that surviving keys kept their ids
    * across the MERGE, inserted keys drew above the backfill
    * high-water mark, and the OPTIMIZE rewrite changed no identity
    * (two-way exceptAll). Content converges to the full-feed SCD1
    * oracle: identity plumbing must be invisible to data readers.
    */
  def sqlRows(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val path = Scratch.dir("vlake_sqlrows")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    VersionedLake.upsert(spark, path,
      staged.filter(col("sequence_number") <= t1)
        .withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation"),
      Seq("key_id"), "sequence_number")
    install(spark)
    val short = "lakehouse.events_rt"
    val t = s"$CatalogName.$short"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    val enabled = spark.sql(
      s"CALL $CatalogName.system.enable_row_tracking('$short')")
      .head().getString(0) == "ROW_TRACKING_BACKFILL"
    val idsA = spark.sql(s"SELECT key_id, row_id FROM $t.rows")
      .localCheckpoint(true)
    val hwmA = idsA.agg(max(col("row_id"))).head().getLong(0)
    staged.filter(col("sequence_number") > t1)
      .withColumn("_rn", row_number().over(Window.partitionBy(col("key_id"))
        .orderBy(col("sequence_number").desc)))
      .filter(col("_rn") === 1).drop("_rn")
      .createOrReplaceTempView("sqlrows_feed")
    spark.sql(s"""MERGE INTO $t AS tgt USING sqlrows_feed AS src
      ON tgt.key_id = src.key_id
      WHEN MATCHED AND src.operation = 'DELETE' THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = src.value, props = src.props,
        sequence_number = src.sequence_number
      WHEN NOT MATCHED AND src.operation <> 'DELETE' THEN
        INSERT (key_id, value, props, sequence_number)
        VALUES (src.key_id, src.value, src.props, src.sequence_number)""")
    val idsB = spark.sql(s"SELECT key_id, row_id FROM $t.rows")
      .localCheckpoint(true)
    val stableIds = idsA.join(idsB, "key_id")
      .filter(idsA("row_id") =!= idsB("row_id")).isEmpty
    val freshHigh = idsB.join(idsA, Seq("key_id"), "left_anti")
      .filter(col("row_id") <= hwmA).isEmpty
    spark.sql(s"CALL $CatalogName.system.optimize('$short')")
    val idsC = spark.sql(s"SELECT key_id, row_id FROM $t.rows")
    val surviveOpt = graft.Dist.multisetEqual(idsB, idsC)
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("tracking_enabled", lit(enabled))
      .withColumn("ids_stable_across_sql_merge", lit(stableIds))
      .withColumn("fresh_ids_above_hwm", lit(freshHigh))
      .withColumn("ids_survive_optimize", lit(surviveOpt))
  }

  val sqlRowsSql: String =
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
         true AS tracking_enabled, true AS ids_stable_across_sql_merge,
         true AS fresh_ids_above_hwm, true AS ids_survive_optimize
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** SQL `DELETE FROM … WHERE` as a gate row: the pushed conjunct
    * routes through [[GraftLakeTable.deleteWhere]] → a MERGE-ON-READ
    * position-delete commit. Engine-asserted: the commit's operation is
    * DELETE and it rewrites ZERO data files (`mor_delete_commit` — the
    * new manifest carries the same data lines, only DV mappings moved),
    * and the deletes are CDF-VISIBLE (`cdf_deletes_visible`): the
    * version-over-version change feed contains exactly the doomed keys,
    * every one `change_type = 'delete'` — the contract a downstream SCD
    * consumer needs to drop them. The oracle mirrors the surviving SCD1
    * rows under the same predicate.
    */
  def sqlDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqldel")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    VersionedLake.upsert(spark, path,
      staged.filter(col("operation") =!= "DELETE").drop("operation"),
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_d"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    val before = VersionedLake.versions(spark, path).last
    val dataBefore = VersionedLake.manifestEntries(spark, path, before).data
    spark.sql(s"DELETE FROM $t WHERE key_id < 5")
    val after = VersionedLake.versions(spark, path).last
    val mAfter = VersionedLake.manifestEntries(spark, path, after)
    val morDelete = after == before + 1 &&
      mAfter.data == dataBefore && // zero data files rewritten
      VersionedLake.history(spark, path)
        .filter(col("version") === after).head().getString(1) == "DELETE"
    val cdf = VersionedLake.changes(spark, path, before, after,
      Seq("key_id"), "sequence_number", Seq("value"))
    val cdfOk = cdf.agg(
        count(lit(1)).as("n"),
        sum(when(col("change_type") === "delete" &&
          col("key_id") < 5, 1L).otherwise(0L)).as("ok")).head()
    val cdfDeletesVisible = cdfOk.getLong(0) > 0 &&
      cdfOk.getLong(0) == cdfOk.getLong(1)
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("mor_delete_commit", lit(morDelete))
      .withColumn("cdf_deletes_visible", lit(cdfDeletesVisible))
  }

  val sqlDeleteSql: String =
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
         FROM stg s WHERE operation <> 'DELETE')
       SELECT key_id, value, props, sequence_number AS last_sequence,
         true AS mor_delete_commit, true AS cdf_deletes_visible
       FROM ranked
       WHERE rn = 1 AND key_id >= 5
       ORDER BY key_id"""

  /** SQL `UPDATE … SET … WHERE` as a gate row: the third DML statement
    * through [[graft.plans.GraftUpdateCommand]] — affected rows re-emit
    * with assignments applied as ONE keyed upsert commit
    * (`sql_update_committed`), and an assignment to the merge key is
    * REFUSED (`key_update_refused` — identity changes are not a silent
    * UPDATE). Oracle mirrors the post-update SCD1 state.
    */
  def sqlUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlupd")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    VersionedLake.upsert(spark, path,
      staged.filter(col("operation") =!= "DELETE").drop("operation"),
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_u"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"UPDATE $t SET value = value * 2 WHERE key_id < 50")
    val committedOne = VersionedLake.versions(spark, path).last == before + 1
    val keyRefused =
      try { spark.sql(s"UPDATE $t SET key_id = key_id + 1000"); false }
      catch { case _: Exception => true }
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("sql_update_committed", lit(committedOne))
      .withColumn("key_update_refused", lit(keyRefused))
  }

  val sqlUpdateSql: String =
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
         FROM stg s WHERE operation <> 'DELETE')
       SELECT key_id,
         CASE WHEN key_id < 50 THEN value * 2 ELSE value END AS value,
         props, sequence_number AS last_sequence,
         true AS sql_update_committed, true AS key_update_refused
       FROM ranked
       WHERE rn = 1
       ORDER BY key_id"""

  /** SQL DDL surface as a gate row: `ALTER TABLE … RENAME COLUMN /
    * ALTER COLUMN TYPE / DROP COLUMN` route through the catalog onto
    * the lake's own schema-evolution commits (column mapping, widen-
    * on-read, reader-tombstoned drops) — three statements, three OCC
    * commits in order (`alter_ops_committed` pins the history tail),
    * and the SERVED schema after the statements is the evolved one
    * (`schema_served_evolved`). The oracle mirrors the post-DDL state:
    * renamed column, float→double widened values, dropped column gone.
    */
  def sqlAlter(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlalter")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      .filter(col("operation") =!= "DELETE").drop("operation")
      .withColumn("value", col("value").cast("float"))
      .withColumn("tag", lit("scratch"))
    VersionedLake.upsert(spark, path, staged,
      Seq("key_id"), "sequence_number")
    install(spark)
    val t = s"$CatalogName.lakehouse.events_a"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value FLOAT,
      props STRING, sequence_number BIGINT, tag STRING) USING graft
      LOCATION '$path'""")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN props TO payload")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN value TYPE DOUBLE")
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    val opsTail = VersionedLake.history(spark, path)
      .orderBy(col("version")).collect().map(_.getString(1)).takeRight(3)
    val opsOk = opsTail.sameElements(
      Array("RENAME_COLUMN", "WIDEN_COLUMN", "DROP_COLUMN"))
    val served = spark.table(t).schema
    val servedOk = served.fieldNames.toSet ==
      Set("key_id", "value", "payload", "sequence_number") &&
      served("value").dataType ==
        org.apache.spark.sql.types.DoubleType
    spark.sql(s"""SELECT key_id, value, payload,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("alter_ops_committed", lit(opsOk))
      .withColumn("schema_served_evolved", lit(servedOk))
  }

  val sqlAlterSql: String =
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
         FROM stg s WHERE operation <> 'DELETE')
       SELECT key_id,
         CAST(CAST(value AS REAL) AS DOUBLE) AS value,
         props AS payload, sequence_number AS last_sequence,
         true AS alter_ops_committed, true AS schema_served_evolved
       FROM ranked
       WHERE rn = 1
       ORDER BY key_id"""

  /** `ns.t.partitions` as a gate row — the file-layout metadata table
    * (Iceberg's `partitions`): per hash bucket, file/record/DV-file
    * counts read straight from the manifest (metadata-scale, zero data
    * IO). Bucket membership is engine hash, so the oracle pins the
    * hash-independent facts: the SUM of per-bucket record counts is
    * exactly the resolved key count (upsert writes winners only), and
    * the structural invariants (every bucket ≥1 file, DV files ≤
    * files, the trickled position delete visible in ≥1 bucket) are
    * engine-asserted booleans.
    */
  def sqlPartitions(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlparts")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    VersionedLake.upsert(spark, path,
      staged.filter(col("operation") =!= "DELETE").drop("operation"),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvDelete(spark, path,
      staged.select(col("key_id")).distinct()
        .filter(pmod(col("key_id"), lit(9)) === 0), Seq("key_id"))
    install(spark)
    val t = s"$CatalogName.lakehouse.events_p"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      LOCATION '$path'""")
    val p = spark.table(s"$t.partitions")
    val sane = p.agg(
      sum(when(col("file_count") >= 1 &&
        col("dv_file_count") <= col("file_count") &&
        col("record_count").isNotNull, 0L).otherwise(1L)).as("bad"),
      sum(col("dv_file_count")).as("dv")).head()
    val bucketsSane = sane.getLong(0) == 0L
    val dvVisible = sane.getLong(1) > 0L
    spark.sql(
        s"SELECT CAST(SUM(record_count) AS BIGINT) AS n_records " +
          s"FROM $t.partitions")
      .withColumn("buckets_sane", lit(bucketsSane))
      .withColumn("dv_visible", lit(dvVisible))
  }

  val sqlPartitionsSql: String =
    """WITH stg AS (
         SELECT user_id AS key_id,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL)
       SELECT CAST(COUNT(DISTINCT key_id) AS BIGINT) AS n_records,
         true AS buckets_sane, true AS dv_visible
       FROM stg WHERE operation <> 'DELETE'"""

  /** CATALOG COMMENT METADATA as a gate row (r13 verdict task 8 — ref
    * unity_catalog_setup.py:42-72,193 stamps COMMENTs on the catalog,
    * schemas and volume and introspects them): a namespace is created
    * WITH a comment (CREATE NAMESPACE ... COMMENT), one table comment
    * lands via COMMENT ON TABLE, a second is stamped then UPDATED
    * (last writer wins), and the introspection surface reads back
    * through ordinary SQL — `DESCRIBE NAMESPACE EXTENDED` for the
    * namespace, the `ns.t.describe` metadata relation (the
    * house-style Iceberg metadata-table form) for tables. Emitted
    * rows carry the comments plus schema width and a COUNT(*) per
    * table (the pushed metadata count), so the oracle pins both the
    * comment plumbing and the real row counts; everything is
    * metadata-scale except the seed writes.
    */
  def catalogComments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pa = Scratch.dir("vlake_cmt_orders")
    val pb = Scratch.dir("vlake_cmt_cust")
    VersionedLake.upsert(spark, pa,
      graft.Tables.orders(spark, sfDir)
        .filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .withColumn("seq", lit(1L)),
      Seq("o_orderkey"), "seq")
    VersionedLake.upsert(spark, pb,
      graft.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"))
        .withColumn("seq", lit(1L)),
      Seq("c_custkey"), "seq")
    install(spark)
    val ns = s"$CatalogName.meta_demo"
    val ta = s"$ns.orders_fact"
    val tb = s"$ns.customers_dim"
    spark.sql(s"DROP TABLE IF EXISTS $ta")
    spark.sql(s"DROP TABLE IF EXISTS $tb")
    spark.sql(s"DROP NAMESPACE IF EXISTS $ns")
    spark.sql(
      s"CREATE NAMESPACE $ns COMMENT 'curated commerce layer'")
    spark.sql(s"""CREATE TABLE $ta (o_orderkey BIGINT,
      o_totalprice DOUBLE, o_orderstatus STRING, seq BIGINT)
      USING graft LOCATION '$pa'""")
    spark.sql(s"""CREATE TABLE $tb (c_custkey BIGINT, c_name STRING,
      seq BIGINT) USING graft LOCATION '$pb'""")
    spark.sql(
      s"COMMENT ON TABLE $tb IS 'customer dimension - one row per customer'")
    spark.sql(s"COMMENT ON TABLE $ta IS 'orders fact - draft'")
    // last writer wins - the update path
    spark.sql(s"COMMENT ON TABLE $ta IS 'orders fact - even keys slice'")
    val nsComment = spark.sql(s"DESCRIBE NAMESPACE EXTENDED $ns")
      .filter(lower(col("info_name")) === "comment")
      .select(col("info_value")).head().getString(0)
    def tableRow(t: String, name: String, nCols: Long): DataFrame = {
      val comment = spark
        .sql(s"SELECT prop_value FROM $t.describe " +
          "WHERE prop_key = 'comment'")
        .head().getString(0)
      val n = spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0)
      Seq(("table", name, comment, nCols, n))
        .toDF("object_type", "object_name", "comment", "n_cols", "n_rows")
        .select(col("object_type"), col("object_name"), col("comment"),
          col("n_cols"), col("n_rows"))
    }
    val nsRow = Seq(("namespace", "meta_demo", nsComment))
      .toDF("object_type", "object_name", "comment")
      .withColumn("n_cols", lit(null).cast("long"))
      .withColumn("n_rows", lit(null).cast("long"))
    nsRow
      .unionByName(tableRow(ta, "orders_fact", 4L))
      .unionByName(tableRow(tb, "customers_dim", 3L))
  }

  val catalogCommentsSql: String =
    """SELECT 'namespace' AS object_type, 'meta_demo' AS object_name,
         'curated commerce layer' AS comment,
         CAST(NULL AS BIGINT) AS n_cols, CAST(NULL AS BIGINT) AS n_rows
       UNION ALL
       SELECT 'table', 'orders_fact', 'orders fact - even keys slice',
         CAST(4 AS BIGINT),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_orderkey % 2 = 0)
       UNION ALL
       SELECT 'table', 'customers_dim',
         'customer dimension - one row per customer',
         CAST(3 AS BIGINT),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
       ORDER BY object_type, object_name"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_sql_update" -> ((s, d) => sqlUpdate(s, d).orderBy(col("key_id"))),
    "lake_sql_alter" -> ((s, d) => sqlAlter(s, d).orderBy(col("key_id"))),
    "lake_sql_partitions" -> ((s, d) => sqlPartitions(s, d)),
    "lake_sql_files" -> ((s, d) => sqlFiles(s, d).orderBy(col("version"))),
    "lake_sql_metadata" -> ((s, d) =>
      sqlMetadata(s, d).orderBy(col("src"), col("version"))),
    "lake_sql_read" -> ((s, d) => sqlRead(s, d).orderBy(col("key_id"))),
    "lake_sql_write" -> ((s, d) => sqlWrite(s, d).orderBy(col("key_id"))),
    "lake_sql_ctas" -> ((s, d) => sqlCtas(s, d).orderBy(col("key_id"))),
    "lake_sql_expectations" -> ((s, d) =>
      sqlExpectations(s, d).orderBy(col("key_id"))),
    "lake_sql_merge" -> ((s, d) => sqlMerge(s, d).orderBy(col("key_id"))),
    "lake_sql_rows" -> ((s, d) => sqlRows(s, d).orderBy(col("key_id"))),
    "lake_sql_delete" -> ((s, d) => sqlDelete(s, d).orderBy(col("key_id"))),
    "lake_sql_agg_pushdown" -> ((s, d) => sqlAggPushdown(s, d)),
    "catalog_comments" -> ((s, d) => catalogComments(s, d)
      .orderBy(col("object_type"), col("object_name"))))

  def oracles: Map[String, String] = Map(
    "lake_sql_update" -> sqlUpdateSql,
    "lake_sql_alter" -> sqlAlterSql,
    "lake_sql_partitions" -> sqlPartitionsSql,
    "lake_sql_files" -> sqlFilesSql,
    "lake_sql_metadata" -> sqlMetadataSql,
    "lake_sql_read" -> sqlReadSql,
    "lake_sql_write" -> sqlWriteSql,
    "lake_sql_ctas" -> sqlCtasSql,
    "lake_sql_expectations" -> sqlExpectationsSql,
    "lake_sql_merge" -> sqlMergeSql,
    "lake_sql_rows" -> sqlRowsSql,
    "lake_sql_delete" -> sqlDeleteSql,
    "lake_sql_agg_pushdown" -> sqlAggPushdownSql,
    "catalog_comments" -> catalogCommentsSql)
}
