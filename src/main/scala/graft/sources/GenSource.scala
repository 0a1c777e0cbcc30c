package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftgen` — a full DataSource V2 TableProvider: the deterministic
  * row generator as a FIRST-CLASS TABLE (`spark.read.format("graftgen")
  * .option("rows", n).option("parts", p).load()`), demonstrating the
  * complete connector read surface the repo's other sources exercise
  * only from the consumer side:
  *
  *  - **partition planning**: `rows` split into `parts` contiguous id
  *    ranges, one [[InputPartition]] each — the executor-parallel unit;
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): range
  *    predicates on `id` PRUNE WHOLE PARTITIONS at planning time (the
  *    DSv2 analog of parquet row-group/partition skipping) and are
  *    re-applied per row inside the reader for exact residual
  *    semantics, so accepted filters never reach the Spark-side
  *    Filter operator (`explain` shows them under PushedFilters);
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes ONLY requested columns — projecting `id`
  *    never computes `cat`'s string (scan ReadSchema shows the cut).
  *
  * Every value is a pure function of `id` in BIGINT-safe modular
  * arithmetic (Lehmer LCG step `id·48271 mod (2³¹−1)`, id·48271 <
  * 2⁶³ for all supported id), so a DuckDB `generate_series` oracle
  * reproduces the table bit-exactly — the generator is gate-verified
  * like any other operator, not just spec'd.
  *
  * At 100 TB class this is the shape of a production connector over
  * an internal service/format: planning prunes, readers stream rows
  * without buffering, all state is per-partition.
  */
object GenSource {
  val Modulus = 2147483647L // 2^31 - 1
  val Multiplier = 48271L   // Lehmer/Park-Miller MINSTD

  def keyOf(id: Long): Long = (id * Multiplier) % Modulus
  def catOf(id: Long): String = "c" + (keyOf(id) % 5)

  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("k", LongType, nullable = false)
    .add("cat", StringType, nullable = false)

  /** Oracle CTE fragment mirroring the generator for `rows` ids. */
  def oracleCte(rows: Long): String =
    s"""gen AS (
         SELECT g AS id,
           (g * $Multiplier) % $Modulus AS k,
           'c' || CAST(((g * $Multiplier) % $Modulus) % 5 AS VARCHAR) AS cat
         FROM generate_series(1, $rows) AS t(g))"""

  /** Gate: scan the V2 table with a pushed id range (prunes partitions
    * at plan time) and roll up per category — proves the whole
    * connector stack (planning, pushdown, pruning, readers) end to
    * end against the generate_series mirror.
    */
  def genScanAgg(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // FQCN, not the "graftgen" short name: the short name resolves via
    // the META-INF service file, which exists only after sbt copies
    // resources — the driver's bare-classes classpath may predate that.
    // The spec exercises the short name; the gate must not depend on it.
    spark.read.format("graft.sources.GenSource")
      .option("rows", "100000").option("parts", "16").load()
      .filter(col("id") >= 25000L && col("id") <= 75000L)
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
  }

  val genScanAggSql: String =
    s"""WITH ${oracleCte(100000)}
       SELECT cat, COUNT(*) AS n,
         CAST(SUM(k) AS BIGINT) AS sum_k,
         MIN(id) AS min_id, MAX(id) AS max_id
       FROM gen
       WHERE id >= 25000 AND id <= 75000
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "gen_source_scan" -> ((s, _) =>
      genScanAgg(s).orderBy(org.apache.spark.sql.functions.col("cat"))))

  def oracles: Map[String, String] = Map(
    "gen_source_scan" -> genScanAggSql)
}

/** Short-name registration (`format("graftgen")`) via the standard
  * DataSourceRegister service file.
  */
class GenRegister extends GenSource
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftgen"
}

class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GenTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("parts", "8").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class GenTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  require(rows >= 0 && rows < (1L << 32), s"rows out of range: $rows")
  require(parts > 0, s"parts must be positive: $parts")
  override def name(): String = s"graftgen($rows, $parts)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

private[sources] class GenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  // planning-time id bounds, tightened by every accepted filter
  private var lo = 1L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    take.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    accepted = take
    residual // Spark keeps only these in a post-scan Filter
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GenScan(rows, parts, lo, hi, required)
}

private[sources] class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen rows=$rows parts=$parts idRange=[$lo,$hi] " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** Contiguous ranges of the FULL table, minus those the pushed id
    * bounds prove empty — partition pruning at plan time.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map { p =>
        val start = 1L + p * per
        val end = math.min(rows, (p + 1) * per)
        GenPartition(math.max(start, lo), math.min(end, hi))
      }
      .filter(g => g.start <= g.end)
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
}

private[sources] case class GenPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      // bind column generators once per partition, in required order —
      // unrequested columns are never computed
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "id" => (i: Long) => i
        case "k" => (i: Long) => GenSource.keyOf(i)
        case "cat" => (i: Long) => UTF8String.fromString(GenSource.catOf(i))
        case other => throw new IllegalArgumentException(
          s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id <= p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.toIndexedSeq.map(_(id)))
      override def close(): Unit = ()
    }
  }
}
