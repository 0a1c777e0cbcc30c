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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read `ts` as epoch-nanos LongType (exact — no
    * truncation, ordering identical to the ns timestamp), and expose a
    * microsecond `ts_utc` TimestampType for calendar bucketing (hour+
    * buckets are unaffected by sub-microsecond truncation).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, not `/`: double division of ~1e18 longs loses the
    // low bits and can land one microsecond off
    load(s, d, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .withColumn("ts_utc",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
