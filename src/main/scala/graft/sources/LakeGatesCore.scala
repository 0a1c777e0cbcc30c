package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import LakeModel._

/** Registered end-to-end gate bodies, part 1: time travel, schema evolution, column drop, type widening, version diff, vacuum lifecycle, concurrent writers, DV/MOR, row tracking, restore, CDF gates.
  *
  * One slice of the [[VersionedLake]] surface (r15 verdict task 6
  * split the 5.8k-line object into focused concern files with zero
  * behavior change); self-typed to the object so cross-concern calls
  * resolve exactly as before.
  */
trait LakeGatesCore { this: VersionedLake.type =>

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

  /** DROP COLUMN as a gate row — completing the schema-evolution
    * triangle (ADD / RENAME / DROP) on the versioned lake. v1 lands
    * the first half of the feed WITH `props`; [[dropColumn]] hides it
    * as a metadata-only commit (zero data motion engine-asserted: the
    * manifest's data lines are unchanged); the current read no longer
    * shows the column while time travel to v1 still does (the property
    * set is versioned state); a writer trying to RE-INTRODUCE the name
    * is refused with the version chain unchanged (the physical slot is
    * retained — rewrite-free drops cannot hand the name out again);
    * and the second half trickles in without the column. The final
    * state hash-matches the full-feed SCD1 oracle speaking the evolved
    * (props-free) schema.
    */
  def columnDrop(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_drop")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    val dataBefore = manifestEntries(spark, path, 1).data.toSet
    dropColumn(spark, path, "props")
    val tip = versions(spark, path).last
    val zeroMotion =
      manifestEntries(spark, path, tip).data.toSet == dataBefore
    val hiddenNow = !read(spark, path).columns.contains("props")
    val travelShowsIt = read(spark, path, Some(1)).columns.contains("props")
    val second = asChanges(staged.filter(col("sequence_number") > t1))
      .localCheckpoint(true)
    val reintroduceBlocked =
      try { upsert(spark, path, second, Seq("key_id"), "sequence_number")
        false }
      catch { case _: IllegalArgumentException => true }
    val blockedAtomic = versions(spark, path).last == tip
    dvUpsert(spark, path, second.drop("props"),
      Seq("key_id"), "sequence_number")
    read(spark, path)
      .select(col("key_id"), col("value"),
        col("sequence_number").as("last_sequence"))
      .withColumn("zero_data_motion", lit(zeroMotion))
      .withColumn("hidden_after_drop", lit(hiddenNow))
      .withColumn("time_travel_shows_column", lit(travelShowsIt))
      .withColumn("reintroduce_blocked", lit(reintroduceBlocked))
      .withColumn("blocked_was_atomic", lit(blockedAtomic))
  }

  val columnDropSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, sequence_number AS last_sequence,
         true AS zero_data_motion, true AS hidden_after_drop,
         true AS time_travel_shows_column, true AS reintroduce_blocked,
         true AS blocked_was_atomic
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** TYPE WIDENING as a gate row — the third side of rewrite-free
    * schema evolution. v1 lands the first half of the feed carrying an
    * INT column (`ival = key_id % 1000`); [[widenColumn]] promotes it
    * to BIGINT as a metadata-only commit (zero data motion
    * engine-asserted); the current read surfaces BIGINT — including
    * for the all-narrow v1 files, which the parquet readers upcast —
    * while time travel to v1 still reads INT (versioned property
    * state); then the second half trickles in with values BEYOND the
    * int32 range (`key_id % 1000 + 5_000_000_000`), so the final
    * snapshot mixes int32 and int64 physical encodings in one scan.
    * Hash-matched against the oracle computing the same winner-typed
    * values from the sequence cutoff.
    */
  def typeWidening(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_widen")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    upsert(spark, path,
      asChanges(staged.filter(col("sequence_number") <= t1))
        .withColumn("ival", pmod(col("key_id"), lit(1000)).cast("int")),
      Seq("key_id"), "sequence_number")
    val narrowBefore =
      read(spark, path).schema("ival").dataType == IntegerType
    val dataBefore = manifestEntries(spark, path, 1).data.toSet
    widenColumn(spark, path, "ival", "long")
    val tip = versions(spark, path).last
    val zeroMotion =
      manifestEntries(spark, path, tip).data.toSet == dataBefore
    val wideAfter = read(spark, path).schema("ival").dataType == LongType
    val travelNarrow =
      read(spark, path, Some(1)).schema("ival").dataType == IntegerType
    dvUpsert(spark, path,
      asChanges(staged.filter(col("sequence_number") > t1))
        .withColumn("ival",
          pmod(col("key_id"), lit(1000)) + lit(5000000000L)),
      Seq("key_id"), "sequence_number")
    read(spark, path)
      .select(col("key_id"), col("value"), col("ival"),
        col("sequence_number").as("last_sequence"))
      .withColumn("narrow_before_widen", lit(narrowBefore))
      .withColumn("zero_data_motion", lit(zeroMotion))
      .withColumn("wide_after_widen", lit(wideAfter))
      .withColumn("time_travel_reads_narrow", lit(travelNarrow))
  }

  val typeWideningSql: String =
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
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value,
         CASE WHEN sequence_number <= (SELECT t1 FROM cutoff)
              THEN ((key_id % 1000) + 1000) % 1000
              ELSE ((key_id % 1000) + 1000) % 1000 + 5000000000
         END AS ival,
         sequence_number AS last_sequence,
         true AS narrow_before_widen, true AS zero_data_motion,
         true AS wide_after_widen, true AS time_travel_reads_narrow
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
    val live = remaining.flatMap(v =>
      manifestEntries(spark, path, v).data).toSet
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

  /** OPTIMISTIC CONCURRENCY made visible as a gate row. Four writers
    * exercise every commit path, interleaved the way real racing
    * writers interleave (each `prepare` reads its snapshot BEFORE the
    * competing commit lands):
    *
    *  1. writers A and B split the first half of the change feed by
    *     BUCKET (hash shards 0-7 vs 8-15 — the disjoint-shard ingest
    *     topology) and both prepare against the empty table; A commits
    *     v1, B loses the CAS and must REBASE (exactly one round) to
    *     land v2 — no lost update, both shards visible;
    *  2. writers C and D split the second half by sequence parity
    *     (keys overlap ⇒ buckets overlap) and both prepare against v2;
    *     C commits v3, D's commit must DETECT the conflict and fail
    *     cleanly; the clean retry (a fresh merge off v3) lands v4.
    *
    * The returned table is the converged snapshot — hash-matched
    * against the SEQUENTIAL full-feed SCD1 oracle, which is the
    * serializability proof — plus the commit-path telemetry
    * (n_versions / B's rebase rounds / D's conflict) as constant
    * columns the oracle pins.
    */
  def concurrentWriters(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_occ")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    val bucket = pmod(hash(col("key_id")), lit(16))
    val first = staged.filter(col("sequence_number") <= t1)
    val second = staged.filter(col("sequence_number") > t1)
    val a = asChanges(first.filter(bucket < 8))
    val b = asChanges(first.filter(bucket >= 8))
    // both writers read the SAME (empty) snapshot before either commits
    val pa = prepare(spark, path, a, Seq("key_id"), "sequence_number")
    val pb = prepare(spark, path, b, Seq("key_id"), "sequence_number")
    val ra = commitPending(spark, path, pa)
    val rb = commitPending(spark, path, pb)
    require(ra.version == 1 && ra.rebaseRounds == 0, s"writer A: $ra")
    val c = asChanges(second.filter(col("sequence_number") % 2 === 0))
    val d = asChanges(second.filter(col("sequence_number") % 2 === 1))
    val pc = prepare(spark, path, c, Seq("key_id"), "sequence_number")
    val pd = prepare(spark, path, d, Seq("key_id"), "sequence_number")
    commitPending(spark, path, pc)
    val conflicted =
      try { commitPending(spark, path, pd); false }
      catch { case _: ConcurrentWriteConflict => true }
    if (conflicted) // clean retry: fresh merge against the new snapshot
      upsert(spark, path, d, Seq("key_id"), "sequence_number")
    read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("n_versions", lit(versions(spark, path).size))
      .withColumn("b_rebase_rounds", lit(rb.rebaseRounds))
      .withColumn("overlap_conflict_detected", lit(conflicted))
  }

  val concurrentWritersSql: String =
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
         4 AS n_versions, 1 AS b_rebase_rounds,
         true AS overlap_conflict_detected
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** MERGE-ON-READ as a gate row. v1 lands every key's best non-delete
    * row; the keys whose final CDC op is DELETE then trickle in as
    * three [[dvDelete]] batches — each committing a version that
    * touches ZERO data files (asserted engine-side against the v1
    * manifest and pinned by the oracle). The pre-compact snapshot is
    * captured, [[compactDvs]] folds the DVs into rewritten files, and
    * the post-compact read is proven row-identical (exceptAll both
    * ways) and DV-free. The returned table is the converged snapshot,
    * hash-matched against the full-feed SCD1 oracle — the same final
    * state copy-on-write would have produced, reached at
    * O(rows-deleted) commit cost instead of O(files × file-size).
    */
  def deletionVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_dv")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    upsert(spark, path,
      staged.filter(col("operation") =!= "DELETE").drop("operation"),
      Seq("key_id"), "sequence_number")
    val filesV1 = manifestEntries(spark, path, 1).data.toSet
    val w = Window.partitionBy(col("key_id"))
      .orderBy(col("sequence_number").desc)
    val delKeys = staged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("operation") === "DELETE")
      .select(col("key_id"))
      .localCheckpoint(true)
    (0 to 2).foreach { i =>
      dvDelete(spark, path,
        delKeys.filter(pmod(col("key_id"), lit(3)) === i), Seq("key_id"))
    }
    val mAfter = manifestEntries(spark, path, versions(spark, path).last)
    val zeroRewrites = mAfter.data.toSet == filesV1
    val hadDvs = mAfter.dv.nonEmpty
    val before = read(spark, path).localCheckpoint(true)
    compactDvs(spark, path)
    val after = read(spark, path)
    val identical = graft.Dist.multisetEqual(before, after)
    val dvFree =
      manifestEntries(spark, path, versions(spark, path).last).dv.isEmpty
    after
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("zero_data_rewrites_before_compact", lit(zeroRewrites))
      .withColumn("dv_files_present_before_compact", lit(hadDvs))
      .withColumn("post_compact_identical", lit(identical))
      .withColumn("dv_free_after_compact", lit(dvFree))
  }

  val deletionVectorsSql: String =
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
         true AS zero_data_rewrites_before_compact,
         true AS dv_files_present_before_compact,
         true AS post_compact_identical,
         true AS dv_free_after_compact
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** MOR UPSERT as a gate row: v1 lands HALF the change feed
    * copy-on-write, then the second half trickles in as three
    * [[dvUpsert]] batches SPLIT BY SEQUENCE PARITY-OF-THREE — i.e.
    * deliberately out of order, so late-arriving older changes, ties,
    * tombstone retention and re-updates of deleted keys all occur and
    * must resolve to the same winners a sequential merge picks. The
    * engine asserts v1's data files all survive untouched (MOR appends,
    * never rewrites) and that DV mappings exist; the converged snapshot
    * hash-matches the full-feed SCD1 oracle.
    */
  def morUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_mor")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    upsert(spark, path, asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    val filesV1 = manifestEntries(spark, path, 1).data.toSet
    val second = staged.filter(col("sequence_number") > t1)
    (0 to 2).foreach { i => // parity split ⇒ out-of-order arrival
      dvUpsert(spark, path,
        asChanges(second.filter(pmod(col("sequence_number"), lit(3)) === i)),
        Seq("key_id"), "sequence_number")
    }
    val mAfter = manifestEntries(spark, path, versions(spark, path).last)
    val zeroRewrites = filesV1.subsetOf(mAfter.data.toSet)
    val appendsLanded = mAfter.data.size > filesV1.size
    val hadDvs = mAfter.dv.nonEmpty
    read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("zero_data_rewrites", lit(zeroRewrites))
      .withColumn("appends_landed", lit(appendsLanded))
      .withColumn("dv_files_present", lit(hadDvs))
  }

  val morUpsertSql: String =
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
         true AS zero_data_rewrites, true AS appends_landed,
         true AS dv_files_present
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** ROW TRACKING as a gate row — the full identity lifecycle:
    * v1 lands half the change feed, [[enableRowTracking]] BACKFILLS
    * ids, a COW upsert applies the rest of the feed (updates inherit,
    * new keys draw above the recorded hwm), a MOR touch-up bumps every
    * live row's value (+1.0, sequence shifted by the feed's max — the
    * appended winners must INHERIT ids through the DV join), and an
    * OPTIMIZE rewrite must carry the ids bit-identically. The emitted
    * booleans pin each invariant; the data columns converge to the
    * touched-up SCD1 oracle:
    *
    *  - `ids_distinct`            — no duplicate identity at the tip
    *  - `ids_stable_across_updates` — keys alive before+after the COW
    *     merge kept their ids
    *  - `fresh_ids_above_hwm`     — new keys' ids all exceed the hwm
    *     recorded at backfill
    *  - `ids_survive_mor`         — the MOR pass changed no identity
    *  - `ids_survive_optimize`    — the rewrite changed NOTHING
    *     (two-way exceptAll on (key, id))
    *  - `hwm_monotone`            — the allocation mark never moved
    *     backwards
    */
  def rowTracking(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_rowid")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    upsert(spark, path, asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    enableRowTracking(spark, path)
    def ids(): DataFrame = readWithRowIds(spark, path)
      .select(col("key_id"), col("row_id")).localCheckpoint(true)
    def hwmNow(): Long =
      rowIdHwm(manifestEntries(spark, path, versions(spark, path).last))
    val idsA = ids()
    val hwmA = hwmNow()
    upsert(spark, path, asChanges(staged.filter(col("sequence_number") > t1)),
      Seq("key_id"), "sequence_number")
    val idsB = ids()
    val stableUpd = idsA.join(idsB, "key_id")
      .filter(idsA("row_id") =!= idsB("row_id")).isEmpty
    val freshHigh = idsB.join(idsA, Seq("key_id"), "left_anti")
      .filter(col("row_id") <= hwmA).isEmpty
    // MOR touch-up: +1.0 to every live row, sequence shifted past the
    // whole feed so every update wins
    val touchUp = read(spark, path)
      .select(col("key_id"), (col("value") + lit(1.0)).as("value"),
        col("props"),
        (col("sequence_number") + lit(maxSeq)).as("sequence_number"))
    dvUpsert(spark, path, touchUp, Seq("key_id"), "sequence_number")
    val idsC = ids()
    val stableMor = idsB.join(idsC, "key_id")
      .filter(idsB("row_id") =!= idsC("row_id")).isEmpty
    optimizeSmallFiles(spark, path)
    val idsD = ids()
    val stableOpt = graft.Dist.multisetEqual(idsC, idsD)
    val distinctIds =
      idsD.count() == idsD.select(col("row_id")).distinct().count()
    val hwmMonotone = hwmNow() >= hwmA
    read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("ids_distinct", lit(distinctIds))
      .withColumn("ids_stable_across_updates", lit(stableUpd))
      .withColumn("fresh_ids_above_hwm", lit(freshHigh))
      .withColumn("ids_survive_mor", lit(stableMor))
      .withColumn("ids_survive_optimize", lit(stableOpt))
      .withColumn("hwm_monotone", lit(hwmMonotone))
  }

  val rowTrackingSql: String =
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
       SELECT key_id, value + 1.0 AS value, props,
         sequence_number + (SELECT MAX(sequence_number) FROM stg)
           AS last_sequence,
         true AS ids_distinct, true AS ids_stable_across_updates,
         true AS fresh_ids_above_hwm, true AS ids_survive_mor,
         true AS ids_survive_optimize, true AS hwm_monotone
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** RESTORE as a gate row: three sequence-ranged merges commit v1..v3,
    * [[restore]] rolls the table back to v1 as v4, and the read of the
    * new tip must equal the FIRST-THIRD SCD1 state — the proof that
    * rollback reconstructs old data exactly. Engine-side assertions the
    * oracle pins: the restore commit references v1's files VERBATIM
    * (`restore_by_reference` — zero data movement), and after
    * `vacuum(retainLast = 1)` drops every older manifest the restored
    * tip still reads intact with the disk holding exactly its live set
    * (`survives_vacuum`) — retention follows manifest REFERENCES, not
    * write time, so files first committed at v1 are kept alive by v4.
    */
  def restoreRollback(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_restore")
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
    val r = restore(spark, path, toVersion = 1)
    val m1 = manifestEntries(spark, path, 1)
    val m4 = manifestEntries(spark, path, r.version)
    val byReference = m4.data == m1.data && m4.dv == m1.dv
    vacuum(spark, path, retainLast = 1)
    val remaining = versions(spark, path)
    val live = remaining
      .flatMap(v => manifestEntries(spark, path, v).allFiles).toSet
    val f = fs(spark)
    val onDisk = f.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gbucket="))
      .flatMap(d => f.listStatus(d.getPath).filter(_.isFile)
        .map(s => s"${d.getPath.getName}/${s.getPath.getName}"))
      .toSet
    val survivesVacuum = remaining == Seq(r.version) && onDisk == live
    read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("restored_as_version", lit(r.version))
      .withColumn("restore_by_reference", lit(byReference))
      .withColumn("survives_vacuum", lit(survivesVacuum))
  }

  val restoreRollbackSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cutoff AS (SELECT MAX(sequence_number) // 3 AS t1 FROM stg),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         4 AS restored_as_version, true AS restore_by_reference,
         true AS survives_vacuum
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  /** INCREMENTAL CDF as a gate row — the same change classification
    * [[versionDiff]] proves, now computed by [[changes]] from the
    * manifest diff instead of two full snapshot scans. v1 lands the
    * first half of the feed copy-on-write over 64 buckets; the second
    * half, RESTRICTED to a sparse key subset (`key_id % 10 = 0`, so
    * most buckets never change), trickles in as two parity-split
    * [[dvUpsert]] batches. The engine then asserts what makes the
    * incremental form matter: the files [[changes]] scanned (added +
    * removed + DV-repointed) are STRICTLY FEWER than one full snapshot
    * of either endpoint (`scan_pruned`) — at 100 TB that is megabytes
    * instead of two table scans. The change rows themselves hash-match
    * the oracle's diff of the two SCD1 states.
    */
  /** The sparse-trickle CDF fixture (v1 = first half of the feed,
    * copy-on-write over 64 buckets; then the second half restricted to
    * `key_id % 10 = 0` as two parity-split MOR commits), built ONCE
    * per JVM and shared by the two change-feed gates
    * ([[incrementalCdf]], [[cdfPreimage]]) and their bench repeat
    * runs. The table is immutable after construction — both gates only
    * READ it — so sharing changes nothing semantically, and the
    * measured cost of each row becomes the CHANGE-FEED READ it exists
    * to prove, not a rebuild of the same fixture (a production
    * consumer does not rebuild the table to read its CDF).
    */
  private[sources] val sparseTrickleMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[sources] def sparseTrickleTable(spark: SparkSession,
      sfDir: String): String = {
    // a memoized fixture can be swept from /tmp by another harness
    // process's Scratch.sweep while this JVM still holds the path —
    // validate and rebuild rather than read a vanished table
    val cached = sparseTrickleMemo.get(sfDir)
    if (cached != null && versions(spark, cached).isEmpty)
      sparseTrickleMemo.remove(sfDir, cached)
    sparseTrickleMemo.computeIfAbsent(sfDir, _ => {
      val path = Scratch.dir("vlake_icdf")
      val staged =
        graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
      val t1 = maxSeq / 2
      def asChanges(df: DataFrame): DataFrame =
        df.withColumn("_deleted", col("operation") === "DELETE")
          .drop("operation")
      upsert(spark, path,
        asChanges(staged.filter(col("sequence_number") <= t1)),
        Seq("key_id"), "sequence_number", numBuckets = 64)
      val trickle = staged.filter(col("sequence_number") > t1 &&
        col("key_id") % 10 === 0)
      (0 to 1).foreach { i => // parity split ⇒ out-of-order arrival
        dvUpsert(spark, path,
          asChanges(
            trickle.filter(pmod(col("sequence_number"), lit(2)) === i)),
          Seq("key_id"), "sequence_number")
      }
      path
    })
  }

  /** The shared immutable sparse-trickle CDF fixture, for gates in
    * sibling files (`lake_sql_cdf` reads it through the SQL catalog).
    * READ-ONLY by contract: both CDF gates and the SQL TVF gate share
    * the table; committing to it would corrupt their oracles.
    */
  private[sources] def cdfFixtureTable(spark: SparkSession,
      sfDir: String): String = sparseTrickleTable(spark, sfDir)

  def incrementalCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val path = sparseTrickleTable(spark, sfDir)
    val last = versions(spark, path).last
    val mA = manifestEntries(spark, path, 1)
    val mB = manifestEntries(spark, path, last)
    val scanned = // exactly the files [[changes]] opens, from the same diff
      mA.data.filterNot(mB.data.toSet).size +
        mB.data.filterNot(mA.data.toSet).size +
        mA.data.count(f =>
          mB.data.toSet(f) && mB.dv.get(f) != mA.dv.get(f))
    val pruned = scanned < mA.data.size && scanned < mB.data.size
    changes(spark, path, fromVersion = 1, toVersion = last,
      keyCols = Seq("key_id"), seqCol = "sequence_number",
      valueCols = Seq("value"))
      .withColumn("scan_pruned", lit(pruned))
  }

  val incrementalCdfSql: String =
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
       feed2 AS (
         SELECT s.* FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1
            OR (s.sequence_number > c.t1 AND s.key_id % 10 = 0)),
       r2 AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM feed2 s),
       v2 AS (
         SELECT key_id, value AS new_value, sequence_number AS new_sequence
         FROM r2 WHERE rn = 1 AND operation <> 'DELETE')
       SELECT COALESCE(v1.key_id, v2.key_id) AS key_id,
         CASE WHEN v1.old_sequence IS NULL THEN 'insert'
              WHEN v2.new_sequence IS NULL THEN 'delete'
              ELSE 'update' END AS change_type,
         v1.old_value, v2.new_value, v1.old_sequence, v2.new_sequence,
         true AS scan_pruned
       FROM v1
       FULL JOIN v2 ON v1.key_id = v2.key_id
       WHERE v1.old_sequence IS NULL OR v2.new_sequence IS NULL
          OR v1.old_sequence <> v2.new_sequence
       ORDER BY key_id"""

  /** CDF UPDATE PREIMAGES as a gate row: the same sparse-trickle
    * construction as [[incrementalCdf]], consumed through
    * [[changesCdf]]'s long form — insert / delete / update_preimage /
    * update_postimage, Delta's `readChangeFeed` event grain. The
    * engine asserts the preimage half against the table itself (every
    * `update_preimage` row equals the v1 snapshot's row for that key —
    * one change-scale anti-join), and the oracle independently
    * re-derives all four event types from the two SCD1 states, so a
    * wrong or missing preimage fails both ways.
    */
  def cdfPreimage(spark: SparkSession, sfDir: String): DataFrame = {
    val path = sparseTrickleTable(spark, sfDir) // shared, read-only
    val last = versions(spark, path).last
    val cdf = changesCdf(spark, path, fromVersion = 1, toVersion = last,
      keyCols = Seq("key_id"), seqCol = "sequence_number",
      valueCols = Seq("value")).localCheckpoint(true)
    val pre = cdf.filter(col("_change_type") === "update_preimage")
      .select(col("key_id"), col("value"), col("_commit_sequence"))
    val v1rows = read(spark, path, Some(1))
      .select(col("key_id"), col("value"),
        col("sequence_number").as("_commit_sequence"))
    val preOk = pre.join(v1rows,
      Seq("key_id", "value", "_commit_sequence"), "left_anti").isEmpty
    cdf.withColumn("preimage_equals_v1", lit(preOk))
  }

  val cdfPreimageSql: String =
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
       feed2 AS (
         SELECT s.* FROM stg s, cutoff c
         WHERE s.sequence_number <= c.t1
            OR (s.sequence_number > c.t1 AND s.key_id % 10 = 0)),
       r2 AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM feed2 s),
       v2 AS (
         SELECT key_id, value AS new_value, sequence_number AS new_sequence
         FROM r2 WHERE rn = 1 AND operation <> 'DELETE'),
       j AS (
         SELECT COALESCE(v1.key_id, v2.key_id) AS key_id,
           CASE WHEN v1.old_sequence IS NULL THEN 'insert'
                WHEN v2.new_sequence IS NULL THEN 'delete'
                ELSE 'update' END AS ct,
           old_value, new_value, old_sequence, new_sequence
         FROM v1
         FULL JOIN v2 ON v1.key_id = v2.key_id
         WHERE v1.old_sequence IS NULL OR v2.new_sequence IS NULL
            OR v1.old_sequence <> v2.new_sequence)
       SELECT key_id, 'insert' AS _change_type, new_value AS value,
         new_sequence AS _commit_sequence, true AS preimage_equals_v1
       FROM j WHERE ct = 'insert'
       UNION ALL
       SELECT key_id, 'delete', old_value, old_sequence, true
       FROM j WHERE ct = 'delete'
       UNION ALL
       SELECT key_id, 'update_preimage', old_value, old_sequence, true
       FROM j WHERE ct = 'update'
       UNION ALL
       SELECT key_id, 'update_postimage', new_value, new_sequence, true
       FROM j WHERE ct = 'update'
       ORDER BY key_id, _change_type"""

}
