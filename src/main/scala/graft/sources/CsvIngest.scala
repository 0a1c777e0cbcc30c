package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze-layer ingestion — the engine analogue of the reference's Auto
  * Loader pattern (`FROM STREAM read_files(path, format => "csv",
  * header => true, inferSchema => true, rescuedDataColumn =>
  * "_rescued_data")`, ref /root/reference/src/pipelines/bronze/
  * customers.sql:19-27) plus the audit columns every bronze table
  * carries (`_source_file`, `_ingested_at`, ref :14-17).
  *
  * Spark-first mapping:
  *  - schema inference        → `inferSchema` on a bounded sample
  *  - rescued-data column     → PERMISSIVE mode + corrupt-record column
  *    (rows that fail the schema land intact in `_rescued_data`)
  *  - `_metadata.file_path`   → the hidden `_metadata` struct on file
  *    sources (same field Spark exposes for parquet/csv/json)
  *  - streaming ingest        → the same options on `readStream` (see
  *    [[streamCsv]]) with Trigger.AvailableNow for batch-incremental
  *    runs
  */
object CsvIngest {

  val RescuedColumn = "_rescued_data"

  /** Batch CSV ingest with rescued-data semantics and audit columns.
    * Without an explicit schema, the schema is inferred first and then
    * the data is re-read WITH the rescued column — Spark only populates
    * `columnNameOfCorruptRecord` when the column is present in the
    * schema, so a plain inferSchema read would silently null malformed
    * rows instead of rescuing them.
    */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val resolved = schema.getOrElse(
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path).schema)
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescuedColumn)
      .schema(resolved.add(RescuedColumn, "string"))
      .csv(path)
      .select(col("*"), col("_metadata.file_path").as("_source_file"),
        col("_metadata.file_modification_time").as("_file_modified_at"))
  }

  /** Streaming CSV ingest (Auto-Loader-shaped): same options, file
    * source; callers add watermarks/sinks. Schema is required for
    * streams (as with Auto Loader's schema hints in production).
    */
  def streamCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescuedColumn)
      .schema(schema.add(RescuedColumn, "string"))
      .csv(path)
      .select(col("*"), col("_metadata.file_path").as("_source_file"))
}
