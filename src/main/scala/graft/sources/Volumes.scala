package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate `catalog_volumes` — the managed-volume lifecycle end to end
  * (ref unity_catalog_setup.py:96-120, the raw landing VOLUME — the
  * last unity_catalog_setup object class without a named analog,
  * r14 verdict task 6):
  *
  *  1. `CALL system.create_volume('lakehouse.raw_landing', path)`
  *     registers the named storage location in the SQL catalog;
  *  2. source files arrive addressed BY VOLUME NAME
  *     (`volume://lakehouse.raw_landing/…` through
  *     [[FileRegistry.resolveDir]]) — the pipeline config carries no
  *     raw path anywhere;
  *  3. two incremental [[FileRegistry.ingestNew]] runs read through
  *     the volume name (exactly-once discovery, the Auto Loader
  *     contract, unchanged);
  *  4. the `ns.volumes` metadata relation ([[GraftVolumesTable]])
  *     lists the volume, and the gate emits the volume_name FROM THAT
  *     RELATION on every row — a registry that lost the volume, listed
  *     it under the wrong namespace, or resolved the wrong location
  *     diverges the compared output.
  *
  * Scale: a volume is one metadata entry; resolution is a map lookup.
  * The ingest itself keeps FileRegistry's O(new files) cost.
  */
object Volumes {

  private val Ns = "lakehouse"
  private val Vol = "raw_landing"

  def volumeIngest(spark: SparkSession, sfDir: String): DataFrame = {
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$Ns")
    val landing = Scratch.dir("vol_landing")
    val reg = Scratch.dir("vol_reg")
    val sink = Scratch.dir("vol_sink")
    // re-entrant gate: the volume may survive from an earlier run of
    // this session pointing at a reclaimed scratch dir
    spark.sql(s"CALL $cat.system.drop_volume('$Ns.$Vol')").collect()
    val created = spark.sql(
      s"CALL $cat.system.create_volume('$Ns.$Vol', '$landing')").head()
    require(created.getBoolean(1), s"create_volume did not register")

    val supplier = graft.Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("supplier_id"))
    def volDir(sub: String): String =
      FileRegistry.resolveDir(spark, s"volume://$Ns.$Vol/$sub")
    def reader(paths: Seq[String]): DataFrame =
      spark.read.parquet(paths: _*)
    // phase 1 arrives in the volume and is ingested through the name
    supplier.filter(col("supplier_id") % 10 < 7)
      .write.parquet(volDir("p1"))
    FileRegistry.ingestNew(spark, s"volume://$Ns.$Vol", reg, sink, reader)
    // phase 2: only the new files are discovered
    supplier.filter(col("supplier_id") % 10 >= 7)
      .write.parquet(volDir("p2"))
    FileRegistry.ingestNew(spark, s"volume://$Ns.$Vol", reg, sink, reader)

    // the inventory relation must list exactly this volume at exactly
    // the registered location; its name rides the compared rows
    val listed = spark.sql(
      s"""SELECT volume_name, location FROM $cat.$Ns.volumes
          WHERE namespace = '$Ns'""").collect()
    require(listed.length == 1 && listed(0).getString(1) == landing,
      s"$Ns.volumes inventory wrong: ${listed.mkString(",")}")
    spark.read.parquet(sink)
      .select(col("supplier_id"),
        col("run").cast("long").as("ingest_run"),
        lit(listed(0).getString(0)).as("volume_name"))
  }

  val volumeIngestSql: String =
    """SELECT s_suppkey AS supplier_id,
         CAST(CASE WHEN s_suppkey % 10 < 7 THEN 1 ELSE 2 END AS BIGINT)
           AS ingest_run,
         'raw_landing' AS volume_name
       FROM supplier
       ORDER BY supplier_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "catalog_volumes" -> ((s, d) =>
      volumeIngest(s, d).orderBy(col("supplier_id"))))

  def oracles: Map[String, String] = Map(
    "catalog_volumes" -> volumeIngestSql)
}
