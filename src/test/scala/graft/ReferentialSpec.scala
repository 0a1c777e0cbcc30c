package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

class ReferentialSpec extends AnyFunSuite {
  import TestSpark._

  test("audit counts orphans, null FKs and child rows per edge") {
    val rows = Quality.referentialAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 7, s"expected 7 edges, got ${rows.keySet}")
    // generated testdata is referentially clean: zero orphans anywhere,
    // child totals match the raw tables
    rows.values.foreach { r =>
      assert(r.getAs[Long]("orphan_rows") == 0L, r.toString)
      assert(r.getAs[Long]("orphan_keys") == 0L, r.toString)
    }
    assert(rows("lineitem_orders").getAs[Long]("child_rows") ==
      Tables.lineitem(spark, sf).count())
  }

  test("a dirty child is accounted exactly: orphans, nulls, totals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(8L), None)
      .toDF("fk")
    // same shape as one audit edge, inlined
    val got = child
      .join(broadcast(parent.select(col("pk").as("k")).distinct()
        .withColumn("_p", lit(1))),
        child("fk") === col("k"), "left")
      .agg(count(lit(1)).as("child_rows"),
        sum(when(col("fk").isNull, 1).otherwise(0)).as("null_fk_rows"),
        sum(when(col("fk").isNotNull && col("_p").isNull, 1).otherwise(0))
          .as("orphan_rows"),
        countDistinct(when(col("fk").isNotNull && col("_p").isNull,
          col("fk"))).as("orphan_keys"))
      .head()
    assert(got.getAs[Long]("child_rows") == 6L)
    assert(got.getAs[Long]("null_fk_rows") == 1L)
    assert(got.getAs[Long]("orphan_rows") == 3L) // 9, 9, 8
    assert(got.getAs[Long]("orphan_keys") == 2L) // {9, 8}
  }
}
