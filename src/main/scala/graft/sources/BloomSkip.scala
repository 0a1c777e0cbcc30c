package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level BLOOM skipping — the third data-skipping family beside
  * min/max stats ([[StatsSkipping]]) and Z-order ([[ZOrder]]), and the
  * one that covers the case the other two cannot: POINT LOOKUPS on a
  * high-cardinality column the table is NOT clustered by. A table laid
  * out by ship date scatters order keys uniformly, so every file's
  * [min,max] order-key range spans the domain and stats prune nothing;
  * a per-file Bloom filter answers "can this key be in this file" in
  * O(bits) regardless of layout (Delta's `bloomFilterIndex` and
  * Iceberg's parquet bloom columns are this structure's table-format
  * forms; the reference inherits them from Databricks).
  *
  * Mechanics: [[writeWithBlooms]] writes the clustered table, then one
  * aggregation per file builds the OR-mergeable native `bloom_build`
  * aggregate ([[graft.functions.BloomBuildAgg]]) over the lookup
  * column into a `_graft_bloom` manifest. [[prunedLookup]] tests each
  * probe key against each file's filter (manifest-sized work: #files ×
  * #keys bit probes, no data read), reads only maybe-containing files,
  * and re-applies the exact predicate — false positives cost IO, never
  * correctness; false negatives cannot happen, so the result equals
  * the full scan exactly and the oracle is the plain filter.
  *
  * At 100 TB: the manifest is #files rows of [[NumBits]]/8 bytes; the
  * planning step is a metadata scan; a k-key lookup schedules tasks
  * for only the few files whose filters fire.
  */
object BloomSkip {

  val BloomDir = "_graft_bloom"
  val NumBits = 1 << 17 // 16 KB/file
  val ProbeEvery = 2500L

  /** Range-cluster `df` by `clusterCol` into ~`numFiles` files and
    * build the per-file bloom manifest over `keyCol`.
    */
  def writeWithBlooms(df: DataFrame, path: String, clusterCol: String,
      keyCol: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(clusterCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(call_function("bloom_build", col(keyCol), lit(NumBits))
        .as("bloom"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$BloomDir")
  }

  /** (files kept, total files) for a probe-key set — planning only. */
  def selectFiles(spark: SparkSession, path: String,
      keys: Seq[Long]): (Seq[String], Long) = {
    import spark.implicits._
    val manifest = spark.read.parquet(s"$path/$BloomDir")
    val total = manifest.count()
    val kept = manifest
      .crossJoin(broadcast(keys.toDF("probe_key")))
      .filter(call_function("bloom_contains", col("bloom"),
        col("probe_key")))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Bloom-pruned point lookup: open only maybe-containing files, then
    * apply the exact key predicate.
    */
  def prunedLookup(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val (files, _) = selectFiles(spark, path, keys)
    val src =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    src.filter(col(keyCol).isin(keys: _*))
  }

  /** Gate: lineitem laid out by ship date, looked up by order key.
    * Probe keys come from ORDERS (the dimension side — at scale the
    * collect is a small key list, the model-state contract).
    */
  def bloomSkipLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("bloom_skip")
    writeWithBlooms(graft.Tables.lineitem(spark, sfDir), path,
      "l_shipdate", "l_orderkey", numFiles = 16)
    val keys = graft.Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(ProbeEvery)) === 0)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSeq.sorted
    prunedLookup(spark, path, "l_orderkey", keys)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        graft.operators.Medallion.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  /** Oracle: plain filtered aggregate — pruning must be invisible.
    * (Every l_orderkey exists in orders, so the key-list filter equals
    * the modulus predicate.)
    */
  val bloomSkipLookupSql: String =
    s"""SELECT l_orderkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_orderkey % $ProbeEvery = 0
       GROUP BY l_orderkey
       ORDER BY l_orderkey"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_bloom_skip" -> ((s, d) =>
      bloomSkipLookup(s, d).orderBy(col("l_orderkey"))))

  def oracles: Map[String, String] = Map(
    "lake_bloom_skip" -> bloomSkipLookupSql)
}
