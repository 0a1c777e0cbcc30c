package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured versioned table — the engine-side analogue of the
  * Delta protocol the reference's tables live on (every reference table
  * is `USING DELTA` with history/time-travel supplied by the platform;
  * ref /root/reference/docs/ARCHITECTURE.md, src/setup/
  * unity_catalog_setup.py registers Delta locations):
  *
  *  - data files are IMMUTABLE; a merge writes new files for the hash
  *    buckets it touches and never modifies or deletes existing ones;
  *  - each commit is one manifest under `_log/` listing every live file
  *    of that version; writing the manifest (create temp + atomic
  *    rename) IS the commit point — a crash at any earlier moment
  *    leaves only unreferenced orphan files and the previous version
  *    fully intact (no swap window at all, unlike a rewrite-in-place
  *    layout);
  *  - reads resolve a manifest (latest or an explicit version — time
  *    travel) and scan exactly the files it lists;
  *  - [[vacuum]] deletes files no manifest ≥ the retention floor
  *    references, and drops the older manifests.
  *
  * Scale shape: a merge reads only touched buckets' live files (the
  * manifest makes bucket→file resolution O(#files) metadata, no
  * directory listing), writes only touched buckets, and commits O(1)
  * files. The manifest is a full snapshot (O(#files) lines), so readers
  * never replay a log chain. Same merge semantics as
  * [[LakeWriter.upsert]]: last-writer-wins by sequence, DELETE
  * tombstones retained so late-arriving older changes cannot resurrect
  * a deleted key; readers filter tombstones.
  */
object VersionedLake {

  private val LogDir = "_log"

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(path: String, v: Int): Path =
    new Path(f"$path/$LogDir/v$v%06d.txt")

  /** Committed versions, ascending (empty → table does not exist). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = new Path(s"$path/$LogDir")
    val f = fs(spark)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      .sorted.toSeq
  }

  /** Live data files (relative to `path`) at `version`. */
  private def manifestFiles(spark: SparkSession, path: String,
      version: Int): Seq[String] = {
    val in = fs(spark).open(manifestPath(path, version))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Atomic commit: write the full file list to a temp manifest, then
    * rename into the log. The rename is the moment the version exists.
    */
  private def commit(spark: SparkSession, path: String, version: Int,
      files: Seq[String]): Unit = {
    val f = fs(spark)
    f.mkdirs(new Path(s"$path/$LogDir"))
    val tmp = new Path(s"$path/$LogDir/.v$version.tmp")
    val out = f.create(tmp, true)
    try out.write(files.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, manifestPath(path, version)))
      throw new java.io.IOException(s"commit of version $version failed")
  }

  /** MERGE-style upsert committing a new version. Same contract as
    * [[LakeWriter.upsert]] (keys + sequence, `_deleted` for deletes),
    * but immutable-file/log-structured: untouched buckets' files carry
    * over into the new manifest by reference, not by rewrite.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], seqCol: String, numBuckets: Int = 16): Unit = {
    val f = fs(spark)
    val vs = versions(spark, path)
    val tagged0 = updates.withColumn("_is_update", lit(1))
    val tagged = (if (tagged0.columns.contains("_deleted")) tagged0
      else tagged0.withColumn("_deleted", lit(false)))
      .withColumn("gbucket", pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
    def resolve(all: DataFrame): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(seqCol).desc, col("_is_update").desc)
      all.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_rn", "_is_update")
        .withColumn("_deleted", coalesce(col("_deleted"), lit(false)))
    }
    val prior: Seq[String] = vs.lastOption
      .map(v => manifestFiles(spark, path, v)).getOrElse(Seq.empty)
    val touched: Seq[Int] =
      if (prior.isEmpty) Seq.empty // first commit: nothing to merge with
      else tagged.select(col("gbucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq // ≤ numBuckets ints
    val (carried, replaced) = prior.partition { rel =>
      val b = rel.split("/")(0).stripPrefix("gbucket=").toInt
      !touched.contains(b)
    }
    val existing =
      if (replaced.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(replaced.map(r => s"$path/$r"): _*)
        .withColumn("_is_update", lit(0)))
    val merged = existing match {
      case None => resolve(tagged)
      case Some(ex) =>
        val withDel = if (ex.columns.contains("_deleted")) ex
          else ex.withColumn("_deleted", lit(false))
        resolve(withDel.unionByName(tagged, allowMissingColumns = true))
    }
    // stage new bucket files, then adopt them under immutable
    // version-tagged names; staging never touches live data
    val version = vs.lastOption.getOrElse(0) + 1
    val stage = path + s"_stage_v$version"
    merged.write.partitionBy("gbucket").mode(SaveMode.Overwrite).parquet(stage)
    val adopted = scala.collection.mutable.ArrayBuffer[String]()
    f.listStatus(new Path(stage)).filter(_.isDirectory).foreach { d =>
      val bucketDir = d.getPath.getName // gbucket=N
      f.mkdirs(new Path(s"$path/$bucketDir"))
      f.listStatus(d.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (s, i) =>
          val rel = f"$bucketDir/v$version%06d-$i%04d.parquet"
          if (!f.rename(s.getPath, new Path(s"$path/$rel")))
            throw new java.io.IOException(s"cannot adopt $rel")
          adopted += rel
        }
    }
    f.delete(new Path(stage), true)
    commit(spark, path, version, carried ++ adopted)
  }

  /** Snapshot read — latest version, or time travel to `asOfVersion`.
    * Tombstones filtered; bucket/bookkeeping columns dropped.
    */
  def read(spark: SparkSession, path: String,
      asOfVersion: Option[Int] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = asOfVersion.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs (vacuumed or never committed)")
    val files = manifestFiles(spark, path, v)
    val df0 = spark.read.option("mergeSchema", "true")
      .option("basePath", path)
      .parquet(files.map(r => s"$path/$r"): _*)
      .drop("gbucket")
    if (df0.columns.contains("_deleted"))
      df0.filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else df0
  }

  /** Retention: keep `retainLast` newest versions; delete every data
    * file referenced ONLY by older manifests (plus crash-orphaned files
    * no manifest references at all), then drop the old manifests.
    */
  def vacuum(spark: SparkSession, path: String, retainLast: Int): Unit = {
    val f = fs(spark)
    val vs = versions(spark, path)
    val keep = vs.takeRight(math.max(retainLast, 1))
    val live: Set[String] =
      keep.flatMap(v => manifestFiles(spark, path, v)).toSet
    f.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gbucket="))
      .foreach { d =>
        f.listStatus(d.getPath).filter(_.isFile).foreach { s =>
          val rel = s"${d.getPath.getName}/${s.getPath.getName}"
          if (!live.contains(rel)) f.delete(s.getPath, false)
        }
      }
    vs.filterNot(keep.contains).foreach(v =>
      f.delete(manifestPath(path, v), false))
  }

  // ---- registered end-to-end demonstration ---------------------------------

  /** Three sequence-ranged merges into a versioned table, then TIME
    * TRAVEL to version 2: the result must equal the batch SCD1 state
    * over only the first two thirds of the change feed — history is
    * reconstructed from retained immutable files, not recomputed. The
    * thresholds are integer arithmetic on max(sequence) so the oracle
    * derives them identically.
    */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    val batches = Seq(
      staged.filter(col("sequence_number") <= t1),
      staged.filter(col("sequence_number") > t1 &&
        col("sequence_number") <= t2),
      staged.filter(col("sequence_number") > t2))
    batches.foreach { b =>
      upsert(spark, path,
        b.withColumn("_deleted", col("operation") === "DELETE")
          .drop("operation"),
        keyCols = Seq("key_id"), seqCol = "sequence_number")
    }
    // retention inside the verified path: v1-only files are deleted,
    // and v2 must still reconstruct exactly from what vacuum retained
    vacuum(spark, path, retainLast = 2)
    read(spark, path, asOfVersion = Some(2))
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
  }

  val timeTravelSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cutoff AS (SELECT MAX(sequence_number) * 2 // 3 AS t2 FROM stg),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t2)
       SELECT key_id, value, props, sequence_number AS last_sequence
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** Schema evolution through the versioned upsert, gate-verified: the
    * second merge batch carries a column (`note`) the first never had.
    * Touched buckets rewrite with the union schema (null where the
    * winning row predates the column); untouched buckets keep their
    * old-schema files byte-identical, and the snapshot read reconciles
    * the two via parquet schema merge — the log-less equivalent of a
    * table format's ADD COLUMN, no table rewrite. A key's winner has
    * `note` iff its last change arrived in the evolved batch, which the
    * oracle derives from the same integer sequence cutoff.
    */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_evo")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    val b1 = staged.filter(col("sequence_number") <= t1)
    val b2 = staged.filter(col("sequence_number") > t1)
      .withColumn("note", concat(lit("v2:"), col("key_id").cast("string")))
    Seq(b1, b2).foreach { b =>
      upsert(spark, path,
        b.withColumn("_deleted", col("operation") === "DELETE")
          .drop("operation"),
        keyCols = Seq("key_id"), seqCol = "sequence_number")
    }
    read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"), col("note"))
  }

  val schemaEvolutionSql: String =
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
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         CASE WHEN sequence_number > (SELECT t1 FROM cutoff)
              THEN 'v2:' || CAST(key_id AS VARCHAR) END AS note
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** CHANGE DATA FEED analog: the row-level diff between two committed
    * versions, reconstructed purely from retained snapshots — what a
    * downstream incremental consumer reads instead of the full table
    * (ref docs/CDC_GUIDE.md positions Delta CDF the same way). Two
    * sequence-ranged merges create v1 and v2; the diff is a full-outer
    * join of the snapshot reads on the key, classifying each changed
    * key as insert / update / delete. A key's winning sequence number
    * changes iff its visible row changed, so the seq comparison is the
    * exact change predicate — no column-by-column compare.
    *
    * Scale: both snapshots are bucket-partitioned by the same key hash,
    * so at scale the join shuffles neither side more than once and a
    * bucket-aware reader could co-locate it entirely.
    */
  def versionDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_cdf")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    val batches = Seq(
      staged.filter(col("sequence_number") <= t1),
      staged.filter(col("sequence_number") > t1))
    batches.foreach { b =>
      upsert(spark, path,
        b.withColumn("_deleted", col("operation") === "DELETE")
          .drop("operation"),
        keyCols = Seq("key_id"), seqCol = "sequence_number")
    }
    val v1 = read(spark, path, asOfVersion = Some(1))
      .select(col("key_id"), col("value").as("old_value"),
        col("sequence_number").as("old_sequence"))
    val v2 = read(spark, path, asOfVersion = Some(2))
      .select(col("key_id"), col("value").as("new_value"),
        col("sequence_number").as("new_sequence"))
    v1.join(v2, Seq("key_id"), "full_outer")
      .filter(col("old_sequence").isNull || col("new_sequence").isNull ||
        col("old_sequence") =!= col("new_sequence"))
      .select(col("key_id"),
        when(col("old_sequence").isNull, "insert")
          .when(col("new_sequence").isNull, "delete")
          .otherwise("update").as("change_type"),
        col("old_value"), col("new_value"),
        col("old_sequence"), col("new_sequence"))
  }

  val versionDiffSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value
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
         SELECT key_id, value AS old_value, sequence_number AS old_sequence
         FROM r1 WHERE rn = 1 AND operation <> 'DELETE'),
       r2 AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s),
       v2 AS (
         SELECT key_id, value AS new_value, sequence_number AS new_sequence
         FROM r2 WHERE rn = 1 AND operation <> 'DELETE')
       SELECT COALESCE(v1.key_id, v2.key_id) AS key_id,
         CASE WHEN v1.old_sequence IS NULL THEN 'insert'
              WHEN v2.new_sequence IS NULL THEN 'delete'
              ELSE 'update' END AS change_type,
         v1.old_value, v2.new_value, v1.old_sequence, v2.new_sequence
       FROM v1
       FULL JOIN v2 ON v1.key_id = v2.key_id
       WHERE v1.old_sequence IS NULL OR v2.new_sequence IS NULL
          OR v1.old_sequence <> v2.new_sequence
       ORDER BY key_id"""

  /** VACUUM lifecycle made visible as its own gate row (retention also
    * runs inside [[timeTravel]], but there only the retained read is
    * checked): three merges commit v1..v3, `vacuum(retainLast = 1)`
    * drops v1/v2, and the report proves (a) exactly v3 remains
    * readable, (b) its row count equals the full-feed SCD1 state, and
    * (c) the DISK holds precisely the retained manifest's files — no
    * orphan survived, no live file was deleted. The physical-state
    * boolean is computable only engine-side; the oracle pins it true,
    * the availability/row columns exactly.
    */
  def vacuumLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val path = Scratch.dir("vlake_vac")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    Seq(
      staged.filter(col("sequence_number") <= t1),
      staged.filter(col("sequence_number") > t1 &&
        col("sequence_number") <= t2),
      staged.filter(col("sequence_number") > t2))
      .foreach { b =>
        upsert(spark, path,
          b.withColumn("_deleted", col("operation") === "DELETE")
            .drop("operation"),
          keyCols = Seq("key_id"), seqCol = "sequence_number")
      }
    vacuum(spark, path, retainLast = 1)
    val remaining = versions(spark, path)
    val live = remaining.flatMap(v => manifestFiles(spark, path, v)).toSet
    val f = fs(spark)
    val onDisk = f.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gbucket="))
      .flatMap(d => f.listStatus(d.getPath).filter(_.isFile)
        .map(s => s"${d.getPath.getName}/${s.getPath.getName}"))
      .toSet
    val diskMatches = onDisk == live
    (1 to 3).map { v =>
      val available = remaining.contains(v)
      val rows: Option[Long] =
        if (available) Some(read(spark, path, Some(v)).count()) else None
      (v, available, rows, diskMatches)
    }.toDF("version", "available", "n_rows", "disk_matches_manifest")
  }

  val vacuumLifecycleSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s),
       final_rows AS (
         SELECT COUNT(*) AS n FROM ranked
         WHERE rn = 1 AND operation <> 'DELETE')
       SELECT * FROM (
         SELECT 1 AS version, false AS available,
           CAST(NULL AS BIGINT) AS n_rows, true AS disk_matches_manifest
         UNION ALL
         SELECT 2, false, CAST(NULL AS BIGINT), true
         UNION ALL
         SELECT 3, true, (SELECT n FROM final_rows), true)
       ORDER BY version"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_vacuum_lifecycle" -> ((s, d) =>
      vacuumLifecycle(s, d).orderBy(col("version"))),
    "lake_time_travel" -> ((s, d) =>
      timeTravel(s, d).orderBy(col("key_id"))),
    "lake_schema_evolution" -> ((s, d) =>
      schemaEvolution(s, d).orderBy(col("key_id"))),
    "lake_version_diff" -> ((s, d) =>
      versionDiff(s, d).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "lake_vacuum_lifecycle" -> vacuumLifecycleSql,
    "lake_time_travel" -> timeTravelSql,
    "lake_schema_evolution" -> schemaEvolutionSql,
    "lake_version_diff" -> versionDiffSql)
}
