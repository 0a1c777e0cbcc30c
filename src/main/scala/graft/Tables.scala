package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables.
  *
  * One parquet file per table under the scale-factor dir. At 100 TB the
  * facts (lineitem / orders / events / documents / embeddings) would be
  * many-file partitioned datasets; `spark.read.parquet(dir)` handles
  * both shapes identically, and every downstream operator projects and
  * filters before shuffling so column pruning + predicate pushdown
  * reach the scan.
  */
object Tables {
  val fact: Set[String] =
    Set("lineitem", "orders", "events", "documents", "embeddings")
  val dims: Set[String] =
    Set("region", "nation", "customer", "supplier", "part")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * only accepts as epoch-nanos LongType under `nanosAsLong`) and
    * TIMESTAMP(MICROS) with no UTC flag (which Spark reads as
    * TIMESTAMP_NTZ). Normalize on read: a microsecond BIGINT `ts_us`
    * (the exact arithmetic domain every operator uses — DuckDB mirror
    * `epoch_us(ts)`) and a microsecond `ts_utc` TimestampType for
    * calendar bucketing. The session is pinned UTC, so the NTZ→TZ cast
    * preserves the stored wall-clock micros bit-exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    val tsUs = raw.schema("ts").dataType match {
      // integer `div`, not `/`: double division of ~1e18 longs loses
      // the low bits and can land one microsecond off
      case LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast(TimestampType))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
