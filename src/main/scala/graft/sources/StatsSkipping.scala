package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping — the engine-side analogue of a table
  * format's per-file statistics (Delta's `stats` column / Iceberg's
  * manifest min-max; the reference gets this from Databricks for free,
  * ref /root/reference/src/setup/unity_catalog_setup.py registers Delta
  * tables whose reads are stats-pruned by the platform).
  *
  * Spark's parquet reader already skips ROW GROUPS via footer stats,
  * but at 100 TB the win that matters is skipping whole FILES before
  * any task is scheduled: a range-clustered table with a file-level
  * manifest turns a narrow-predicate scan from "open every footer in
  * 100 TB" into "read one manifest, schedule tasks for the few files
  * that can match". Planning cost is O(#files) metadata, not data.
  *
  * Mechanics:
  *  - [[writeClustered]] range-partitions on the stats column before
  *    writing, so each file covers a tight, nearly disjoint value range
  *    (stats on a randomly-laid-out table prune nothing — every file's
  *    [min,max] spans the domain); it then writes a `_graft_stats`
  *    manifest (one row per file: min, max, rows). The `_` prefix makes
  *    the manifest invisible to normal parquet reads of the table.
  *  - [[prunedRead]] keeps only files whose [min,max] intersects
  *    [lo,hi] and still applies the predicate to the surviving rows, so
  *    the result is EXACT even if the manifest were stale or the
  *    clustering imperfect — skipping is a performance contract, never
  *    a correctness one.
  */
object StatsSkipping {

  val StatsDir = "_graft_stats"

  /** Cluster `df` by `clusterExpr` into ~`numFiles` files and write a
    * per-file manifest carrying min/max for EVERY column in
    * `statsCols`. The cluster expression need not be a stored column —
    * a Z-value ([[ZOrder.interleave16]]) clusters on two dimensions at
    * once without persisting the curve key.
    */
  def writeClustered(df: DataFrame, path: String, statsCols: Seq[String],
      clusterExpr: org.apache.spark.sql.Column, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, clusterExpr)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    // one row per written file; _metadata.file_path is exposed by the
    // parquet source without reading data columns beyond statsCols
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$StatsDir")
  }

  /** Single-column convenience: range-cluster on the stats column. */
  def writeClustered(df: DataFrame, path: String, statsCol: String,
      numFiles: Int): Unit =
    writeClustered(df, path, Seq(statsCol), col(statsCol), numFiles)

  /** (files kept, total files) for a `[lo, hi]` window on any column
    * the manifest carries — the planning step. Bound literals are cast
    * to the manifest's own type for the comparison. The collect is
    * manifest metadata (≤ #files short strings), never table data.
    */
  def selectFiles(spark: SparkSession, path: String, statsCol: String,
      lo: String, hi: String): (Seq[String], Long) = {
    val manifest = spark.read.parquet(s"$path/$StatsDir")
    val t = manifest.schema(s"min_$statsCol").dataType
    val total = manifest.count()
    val kept = manifest
      .filter(col(s"max_$statsCol") >= lit(lo).cast(t) &&
        col(s"min_$statsCol") <= lit(hi).cast(t))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Manifest-pruned scan of `[lo, hi]` on a stats column: only
    * intersecting files are opened, and the row predicate is re-applied
    * so the result equals a full scan + filter exactly.
    */
  def prunedRead(spark: SparkSession, path: String, statsCol: String,
      lo: String, hi: String): DataFrame = {
    val (files, _) = selectFiles(spark, path, statsCol, lo, hi)
    val src =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    val t = src.schema(statsCol).dataType
    src.filter(col(statsCol) >= lit(lo).cast(t) &&
      col(statsCol) <= lit(hi).cast(t))
  }

  // ---- registered end-to-end demonstration ---------------------------------

  /** lineitem → range-clustered lake table on l_shipdate → manifest-
    * pruned scan of a six-month window → pricing aggregate. The oracle
    * is the plain filtered aggregate over the source table: pruning
    * must be invisible in the result.
    */
  def statsSkipAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("stats_skip")
    writeClustered(graft.Tables.lineitem(spark, sfDir), path,
      "l_shipdate", numFiles = 16)
    prunedRead(spark, path, "l_shipdate", Lo, Hi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Medallion.dsum(col("l_extendedprice")).as("sum_price"))
  }

  val Lo = "1995-01-01 00:00:00"
  val Hi = "1995-06-30 23:59:59"

  val statsSkipAggSql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '$Lo' AND l_shipdate <= TIMESTAMP '$Hi'
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_stats_skip" -> ((s, d) =>
      statsSkipAgg(s, d).orderBy(col("l_returnflag"))))

  def oracles: Map[String, String] = Map(
    "lake_stats_skip" -> statsSkipAggSql)
}
