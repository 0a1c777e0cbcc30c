package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse-style table writes without a table format dependency —
  * the sink-side behaviors the reference gets from Delta/DLT
  * (partitioned materialized views with `CLUSTER BY`, AUTO CDC upserts,
  * auto-optimized file sizes; ref /root/reference/src/pipelines/gold/
  * daily_orders.sql:17-20, docs/ARCHITECTURE.md), expressed as plain
  * partitioned-parquet operations.
  *
  * Scale notes:
  *  - [[writePartitioned]] repartitions by the partition columns before
  *    the write so each task owns whole partitions — no
  *    thousand-small-files-per-partition explosion at high parallelism.
  *  - [[upsert]] is the SCD1 merge as a distributed plan: union + one
  *    window per key — never a driver-side read-modify-write.
  *  - [[compact]] is the OPTIMIZE analogue: rewrite to a target file
  *    count per partition.
  */
object LakeWriter {

  /** Partition-aware write: one shuffle on the partition keys, then a
    * dynamic-partition overwrite (only touched partitions replaced —
    * the idempotent-backfill behavior lakehouse pipelines rely on).
    */
  /** @param clusterCols optional within-partition sort (the zOrderCols /
    *        CLUSTER BY analog, ref bronze/orders.sql:15): clusters rows
    *        so parquet row-group min/max stats prune point lookups
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], clusterCols: Seq[String] = Nil): Unit = {
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val repart = df.repartition(partitionCols.map(col): _*)
    val clustered =
      if (clusterCols.isEmpty) repart
      else repart.sortWithinPartitions(clusterCols.map(col): _*)
    clustered.write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** MERGE-style upsert: rows in `updates` replace same-key rows in the
    * table; unmatched keys append. Deletes: pass a `_deleted` boolean
    * in `updates`. Last-writer-wins by `seqCol`.
    *
    * Deleted keys persist as TOMBSTONE rows (`_deleted = true`) rather
    * than being physically removed — otherwise a late-arriving update
    * with an older sequence would resurrect a deleted key on the next
    * merge. [[read]] filters tombstones; [[compact]] can purge them
    * once late data can no longer arrive.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], seqCol: String): Unit = {
    val fs = fileSystem(spark)
    recoverIfCrashed(fs, path)
    // first write is detected by existence, not by exception: a transient
    // IO error / corrupt footer on an EXISTING table must propagate, or
    // the merge would silently rebuild the table from updates alone
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.parquet(path).withColumn("_is_update", lit(0))
      else null // first write: no table yet
    val tagged = updates.withColumn("_is_update", lit(1))
    val all0 = if (existing == null) tagged
      else existing.unionByName(tagged, allowMissingColumns = true)
    val all = if (all0.columns.contains("_deleted")) all0
      else all0.withColumn("_deleted", lit(false))
    // sequence outranks provenance: a late-arriving update with an older
    // sequence must NOT overwrite newer table state; updates win only on
    // sequence ties
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col("_is_update").desc)
    val merged = all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_update")
      .withColumn("_deleted", coalesce(col("_deleted"), lit(false)))
    // parquet has no transaction log: stage then swap (crash-safe)
    val tmp = path + "_staged"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapIn(fs, path, tmp)
  }

  private def fileSystem(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** If a prior swap crashed between moving the live table aside and
    * moving the staged table in, the data survives at `path + "_old"` —
    * restore it before reading.
    */
  private def recoverIfCrashed(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    if (!fs.exists(dst) && fs.exists(old) && !fs.rename(old, dst))
      throw new java.io.IOException(s"swap recovery: cannot restore $old")
  }

  /** Crash-safe directory swap: move the live table aside, move the
    * staged one in, then drop the backup — at every intermediate point a
    * full copy of the table exists on disk (at `path` or `path_old`),
    * unlike delete-then-rename which has a window with no live table.
    */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem, path: String,
      staged: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    fs.delete(old, true) // stale backup from an earlier completed swap
    val hadPrev = fs.exists(dst)
    if (hadPrev && !fs.rename(dst, old))
      throw new java.io.IOException(s"swap: cannot move $dst aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), dst)) {
      if (hadPrev) fs.rename(old, dst) // roll back to the prior table
      throw new java.io.IOException(s"swap: cannot move $staged into place")
    }
    fs.delete(old, true)
  }

  /** Read an upsert-maintained table: live rows only (tombstones
    * filtered, marker column dropped).
    *
    * Side-effect free: a reader must never rename directories, or it
    * races a writer mid-[[swapIn]] (restoring `_old` between the
    * writer's two renames strands the staged data). If a crashed swap
    * left no live dir, serve the `_old` backup read-only; the next
    * WRITE repairs the layout via [[recoverIfCrashed]]. Writers are
    * assumed single-threaded per table (parquet dirs have no log).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fileSystem(spark)
    val src =
      if (fs.exists(new org.apache.hadoop.fs.Path(path))) path
      else if (fs.exists(new org.apache.hadoop.fs.Path(path + "_old")))
        path + "_old"
      else path // fail with the normal missing-path error
    val df = spark.read.parquet(src)
    if (df.columns.contains("_deleted"))
      df.filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else df
  }

  /** OPTIMIZE analogue: rewrite a table directory to `targetFiles`. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val fs = fileSystem(spark)
    recoverIfCrashed(fs, path)
    val df = spark.read.parquet(path)
    val tmp = path + "_compacted"
    df.coalesce(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    swapIn(fs, path, tmp)
  }

  // ---- registered end-to-end sink demonstrations ---------------------------

  /** Partitioned-write round trip: orders → hive-partitioned lake table
    * (partitioned by status, clustered by date within partitions) →
    * read back. The oracle is the source table itself: a lossless sink
    * is exactly what the write path must prove. Partition columns come
    * back as strings (hive dir values), so the status is written
    * pre-stringified and compared as such. Fresh path per invocation
    * ([[Scratch]]): a reused path would keep partitions absent from
    * regenerated source data.
    */
  def partitionedRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val path = Scratch.dir("lake_part")
    val src = graft.Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      col("o_totalprice").as("total_price"),
      col("o_orderdate").as("order_date"),
      col("o_orderstatus").as("order_status"))
    writePartitioned(src, path, Seq("order_status"), Seq("order_date"))
    spark.read.parquet(path)
      .select(col("order_id"), col("customer_id"), col("total_price"),
        col("order_date"), col("order_status"))
  }

  val partitionedRoundTripSql: String =
    """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       o_totalprice AS total_price, o_orderdate AS order_date,
       o_orderstatus AS order_status
       FROM orders
       ORDER BY order_id"""

  /** MERGE-upsert lifecycle in the gate: seed the table with 90% of the
    * keys, then apply one deterministic change batch — inserts (the
    * missing keys, status NEW), updates (every 7th key, status UPD,
    * newer sequence), deletes (every 13th seeded key, newest sequence,
    * overriding any update). Fresh table per invocation ([[Scratch]]):
    * merging into a table left by a previous round's data would keep
    * keys the regenerated source no longer has. The oracle is a pure
    * CASE/WHERE over the source table.
    */
  def upsertLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = Scratch.dir("lake_upsert")
    val orders = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"))
    val seeded = orders.filter(col("order_id") % 10 =!= 0)
      .withColumn("seq", lit(1L))
    upsert(spark, path, seeded, Seq("order_id"), "seq")
    val inserts = orders.filter(col("order_id") % 10 === 0)
      .withColumn("status", lit("NEW")).withColumn("seq", lit(2L))
      .withColumn("_deleted", lit(false))
    val updates = orders
      .filter(col("order_id") % 10 =!= 0 && col("order_id") % 7 === 0)
      .withColumn("status", lit("UPD")).withColumn("seq", lit(2L))
      .withColumn("_deleted", lit(false))
    val deletes = orders
      .filter(col("order_id") % 10 =!= 0 && col("order_id") % 13 === 0)
      .withColumn("seq", lit(3L)).withColumn("_deleted", lit(true))
    upsert(spark, path, inserts.unionByName(updates).unionByName(deletes),
      Seq("order_id"), "seq")
    read(spark, path).select(col("order_id"), col("status"), col("seq"))
  }

  val upsertLifecycleSql: String =
    """SELECT o_orderkey AS order_id,
       CASE WHEN o_orderkey % 10 = 0 THEN 'NEW'
            WHEN o_orderkey % 7 = 0 THEN 'UPD'
            ELSE o_orderstatus END AS status,
       CAST(CASE WHEN o_orderkey % 10 = 0 OR o_orderkey % 7 = 0 THEN 2
            ELSE 1 END AS BIGINT) AS seq
       FROM orders
       WHERE NOT (o_orderkey % 10 != 0 AND o_orderkey % 13 = 0)
       ORDER BY order_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_partitioned_roundtrip" -> ((s, d) =>
      partitionedRoundTrip(s, d).orderBy(org.apache.spark.sql.functions.col("order_id"))),
    "lake_upsert_lifecycle" -> ((s, d) =>
      upsertLifecycle(s, d).orderBy(org.apache.spark.sql.functions.col("order_id"))))

  def oracles: Map[String, String] = Map(
    "lake_partitioned_roundtrip" -> partitionedRoundTripSql,
    "lake_upsert_lifecycle" -> upsertLifecycleSql)
}
