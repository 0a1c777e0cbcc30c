package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("globalRowNumber == the one-partition window, skew + multi-col") {
    // skewed, shuffled, multi-column order (unique per row), fewer
    // rows than partitions in one bucket — every offset edge case
    val rows = (1L to 997L).map(i => (i % 7, i * 31 % 1009, s"k$i"))
    val df = rows.toDF("a", "b", "k").repartition(13)
    val order = Seq(col("a"), col("b"), col("k"))
    val slow = df.withColumn("rn",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val fast = Dist.globalRowNumber(df, order, 16, "rn")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    // more partitions than rows
    val tiny = rows.take(5).toDF("a", "b", "k")
    val tinySlow = tiny.withColumn("rn",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val tinyFast = Dist.globalRowNumber(tiny, order, 16, "rn")
    assert(tinyFast.exceptAll(tinySlow).isEmpty &&
      tinySlow.exceptAll(tinyFast).isEmpty)
  }

  test("lake fresh-id allocation is threshold-independent") {
    // the adaptive switch in assignFreshRowIds is pure cost policy:
    // drive one upsert through each branch and prove the SAME ids land
    // in the files. The threshold is exercised by temporarily forcing
    // the distributed branch via a tiny synthetic threshold — not
    // possible without a knob, so instead prove the two ranking forms
    // agree on exactly the frame shape the allocator ranks
    // ((gbucket, key), post-resolution fresh rows).
    val fresh = (1L to 500L).map(i => (i % 16, i, s"v$i"))
      .toDF("gbucket", "k", "v").repartition(9)
    val order = Seq(col("gbucket"), col("k"))
    val hwm0 = 1234L
    val viaWindow = fresh.withColumn("_row_id", lit(hwm0) +
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val viaDist = Dist.globalRowNumber(fresh, order, 32, "_grn")
      .withColumn("_row_id", lit(hwm0) + col("_grn")).drop("_grn")
    assert(viaDist.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaDist).isEmpty)
  }
}
