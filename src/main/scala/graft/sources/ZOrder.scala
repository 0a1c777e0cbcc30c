package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data
  * layout behind `OPTIMIZE … ZORDER BY (a, b)` on the reference's
  * platform (ref /root/reference/docs/ARCHITECTURE.md auto-optimize;
  * Delta's Z-ordering): interleave the bit-ranks of two columns so
  * files cover compact rectangles of the (a, b) value space, making
  * file-level min/max skipping effective for predicates on EITHER
  * column — a single-column range layout prunes only its own column.
  *
  * Everything is column algebra (shift/mask/or folds — codegen'd, no
  * UDF). The only driver-side values are the four column bounds used
  * to normalize ranks: fixed-size metadata, same class as an IVF
  * centroid collect.
  */
object ZOrder {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into a 32-bit Morton key. Static expression tree: 16
    * shift/mask/or terms per input, fully inside whole-stage codegen.
    */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Rank-normalize `v` from [lo, hi] to the 16-bit integer grid. */
  def norm16(v: Column, lo: Double, hi: Double): Column =
    ((v.cast("double") - lit(lo)) * lit(65535.0) / lit(hi - lo)).cast("int")

  /** Temporal columns rank via epoch seconds; numerics cast directly.
    * Layout-only math — the manifest keeps the column's real type.
    */
  private def asDouble(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case dt if dt.typeName.startsWith("timestamp") ||
        dt == org.apache.spark.sql.types.DateType =>
        col(c).cast("timestamp").cast("long").cast("double")
      case _ => col(c).cast("double")
    }

  /** Z-order `df` on two numeric/temporal columns and write it with a
    * two-column stats manifest ([[StatsSkipping.writeClustered]]); the
    * Morton key is a transient cluster expression, never stored.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int): Unit = {
    val (a, bb) = (asDouble(df, colA), asDouble(df, colB))
    val b = df.agg(min(a), max(a), min(bb), max(bb)).head()
    val z = interleave16(
      norm16(a, b.getDouble(0), b.getDouble(1)),
      norm16(bb, b.getDouble(2), b.getDouble(3)))
    StatsSkipping.writeClustered(df, path, Seq(colA, colB), z, numFiles)
  }

  // ---- registered end-to-end demonstration ---------------------------------

  /** lineitem Z-ordered on (l_shipdate, l_extendedprice), then a
    * manifest-pruned scan on a narrow PRICE band — the dimension a
    * date-clustered layout could never prune — aggregated per return
    * flag. Oracle: the plain filtered aggregate; the curve layout must
    * be invisible in the result.
    */
  def zorderSkipAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("zorder_skip")
    writeZOrdered(graft.Tables.lineitem(spark, sfDir), path,
      "l_shipdate", "l_extendedprice", numFiles = 32)
    StatsSkipping.prunedRead(spark, path, "l_extendedprice", PriceLo, PriceHi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Medallion.dsum(col("l_extendedprice")).as("sum_price"))
  }

  val PriceLo = "50000.0"
  val PriceHi = "52000.0"

  val zorderSkipAggSql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       FROM lineitem
       WHERE l_extendedprice >= $PriceLo AND l_extendedprice <= $PriceHi
       GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_zorder_skip" -> ((s, d) =>
      zorderSkipAgg(s, d).orderBy(col("l_returnflag"))))

  def oracles: Map[String, String] = Map(
    "lake_zorder_skip" -> zorderSkipAggSql)
}
