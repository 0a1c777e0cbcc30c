package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed equivalents of driver-serializing constructs.
  *
  * [[globalRowNumber]] replaces `row_number().over(Window.orderBy(…))`
  * — which moves the WHOLE frame through one partition — with
  * range-partition + within-partition rank + driver-side partition
  * offsets (`parts` longs through the driver, centroid-scale). Ranks
  * depend only on the global order, which range partitioning preserves
  * (every row in partition i sorts before partition i+1), so the
  * output is bit-identical to the global window at any partition
  * count — provided the order columns are unique per row (ties would
  * make BOTH forms partition-dependent). Sole caller today: the
  * graph-ANN long-link rank table, above
  * [[graft.operators.GraphAnn]]'s `RankDistThreshold` (small corpora
  * keep the one-partition window, which is cheaper than a shuffle at
  * gate scale). The lake's fresh row-id allocation stays window-only
  * by design — its allocations are batch-grain, never corpus-grain.
  */
object Dist {

  /** `df` plus `out` = the 1-based global row number under `order`.
    * Requires `order` to be unique per row (see object doc).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], parts: Int,
      out: String): DataFrame = {
    val p = df.repartitionByRange(parts, order: _*)
      .withColumn("_grn_pid", spark_partition_id())
    Caching.withCached(p) {
      val counts = p.groupBy(col("_grn_pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = (0 until parts).map { i =>
        (i, (0 until i).map(counts.getOrElse(_, 0L)).sum)
      }
      val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, (i, off)) =>
        when(col("_grn_pid") === i, lit(off)).otherwise(e)
      }
      val pw = Window.partitionBy(col("_grn_pid")).orderBy(order: _*)
      p.withColumn(out,
          row_number().over(pw).cast("long") + offsetExpr)
        .drop("_grn_pid")
    }
  }
}
