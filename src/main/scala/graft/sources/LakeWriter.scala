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
    val existing =
      try spark.read.parquet(path).withColumn("_is_update", lit(0))
      catch { case _: Exception => null } // first write: no table yet
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
    // parquet has no transaction log: stage then swap via temp suffix
    val tmp = path + "_staged"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Read an upsert-maintained table: live rows only (tombstones
    * filtered, marker column dropped).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains("_deleted"))
      df.filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else df
  }

  /** OPTIMIZE analogue: rewrite a table directory to `targetFiles`. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path + "_compacted"
    df.coalesce(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
