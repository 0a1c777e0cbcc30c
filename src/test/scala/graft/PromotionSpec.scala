package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Promotion

class PromotionSpec extends AnyFunSuite {
  import TestSpark._

  test("full lifecycle: promote, prove equality, refuse broken, isolate") {
    val out = Promotion.queries("pipeline_promote")(spark, sf).collect()
    assert(out.nonEmpty)
    val fields = out.head.schema.fieldNames
    val pi = fields.indexOf("promoted")
    val ei = fields.indexOf("prod_equals_staged")
    val ii = fields.indexOf("failed_promotion_isolated")
    out.foreach { r =>
      assert(r.getBoolean(pi) && r.getBoolean(ei) && r.getBoolean(ii))
    }
  }

  test("validate names every failed expectation; clean candidate passes") {
    val wh = graft.sources.Scratch.dir("promo_spec_wh")
    import spark.implicits._
    val clean = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 3L, 2L, 100.0),
      (java.sql.Date.valueOf("2024-01-02"), 1L, 1L, 50.0))
      .toDF("order_date", "total_orders", "fulfilled_orders",
        "total_revenue")
    clean.write.parquet(s"$wh/clean")
    assert(Promotion.validate(spark, sf, s"$wh/clean").isEmpty)
    // one artifact tripping three smoke rules at once: every failure
    // is reported, each naming its rule
    val broken = Seq(
      (null.asInstanceOf[java.sql.Date], 0L, 5L, -10.0))
      .toDF("order_date", "total_orders", "fulfilled_orders",
        "total_revenue")
    broken.write.parquet(s"$wh/broken")
    val failures = Promotion.validate(spark, sf, s"$wh/broken")
    assert(failures.exists(_.contains("NULL order_date")))
    assert(failures.exists(_.contains("total_orders <= 0")))
    assert(failures.exists(_.contains("negative total_revenue")))
    assert(failures.exists(_.contains("fulfilled > total")))
  }

  test("subtle corruption: ONE null date among the real candidate's " +
      "rows is read and refused") {
    // the r15 gate proves refusal on an unconditionally-corrupted v2;
    // this pins that the smoke actually SCANS the staged rows (not
    // metadata or a sample): the same real candidate passes clean,
    // then fails when exactly one row's order_date goes NULL
    val wh = graft.sources.Scratch.dir("promo_spec_subtle")
    val cand = operators.Gold.dailyOrders(
      operators.Medallion.silverOrdersEnrichedItems(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf)))
    val n = cand.count()
    assert(n >= 100, s"candidate too small for a subtle test: $n rows")
    cand.write.mode("overwrite").parquet(s"$wh/clean")
    assert(Promotion.validate(spark, sf, s"$wh/clean").isEmpty,
      "the real candidate must pass the smoke clean")
    // corrupt exactly one row, deterministically (a fixed rank)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("order_date"))
    cand.withColumn("rn", row_number().over(w))
      .withColumn("order_date",
        when(col("rn") === lit((n / 2).toInt), lit(null)
          .cast("date")).otherwise(col("order_date")))
      .drop("rn")
      .write.mode("overwrite").parquet(s"$wh/subtle")
    val failures = Promotion.validate(spark, sf, s"$wh/subtle")
    assert(failures == Seq("smoke: 1 NULL order_date"),
      s"expected exactly the one-null finding, got: $failures")
    val refused = intercept[Promotion.PromotionRefused] {
      Promotion.promote(spark, sf, s"$wh/subtle")
    }
    assert(refused.failures == Seq("smoke: 1 NULL order_date"))
  }

  test("a refused promotion never re-registers the prod name") {
    val wh = graft.sources.Scratch.dir("promo_spec_iso")
    import spark.implicits._
    val v1 = Seq((java.sql.Date.valueOf("2024-02-01"), 2L, 1L, 10.0))
      .toDF("order_date", "total_orders", "fulfilled_orders",
        "total_revenue")
    v1.write.parquet(s"$wh/v1")
    Promotion.promote(spark, sf, s"$wh/v1")
    val before = spark.table(Promotion.prodName).collect().toSeq
    val v2 = v1.withColumn("total_revenue", lit(-1.0))
    v2.write.parquet(s"$wh/v2")
    intercept[Promotion.PromotionRefused] {
      Promotion.promote(spark, sf, s"$wh/v2")
    }
    assert(spark.table(Promotion.prodName).collect().toSeq == before,
      "refused promotion mutated prod")
  }
}
