package graft.sources

import java.nio.file.{Files, Paths}

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

  /** End-to-end registered demonstration of the rescued-data ingest:
    * materialize the orders table as a CSV fixture (fresh per
    * invocation — see [[Scratch]] — plus one deliberately malformed
    * line), re-ingest it through [[readCsv]] with an explicit schema,
    * and emit the parsed rows with a `was_rescued` flag — the
    * malformed line must surface as a rescued all-NULL row, never be
    * silently dropped. Oracle: the original parquet UNION ALL the one
    * rescued row.
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val fixture = Scratch.dir("csv")
    val orders = graft.Tables.orders(spark, sfDir)
    val asCsv = orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderpriority"))
    asCsv.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(fixture)
    // one malformed line (string where LONG expected): the rescue case
    Files.write(Paths.get(fixture, "malformed.csv"),
      ("o_orderkey,o_custkey,o_orderstatus,o_orderdate,o_orderpriority\n" +
        "not_a_key,not_a_customer,X,9999-99-99,BAD\n")
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("customer_id", LongType),
      StructField("order_status", StringType),
      StructField("order_date", DateType), StructField("priority", StringType)))
    readCsv(spark, fixture, Some(schema))
      .select(col("order_id"), col("customer_id"), col("order_status"),
        col("order_date"), col("priority"),
        col(RescuedColumn).isNotNull.as("was_rescued"))
  }

  val csvRoundTripSql: String =
    """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       o_orderstatus AS order_status, CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority AS priority, false AS was_rescued
       FROM orders
       UNION ALL
       -- the rescued row: PERMISSIVE nulls only the fields that fail to
       -- parse (the LONG/DATE ones); its string fields survive intact
       SELECT NULL, NULL, 'X', NULL, 'BAD', true
       ORDER BY order_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("bronze_csv_rescued" -> ((s, d) =>
      csvRoundTrip(s, d).orderBy(col("order_id"))))

  def oracles: Map[String, String] =
    Map("bronze_csv_rescued" -> csvRoundTripSql)
}
