package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Insights

class InsightsSpec extends AnyFunSuite {
  import TestSpark._

  test("cohort retention: week-0 rate is 1.0 and rates never exceed it") {
    val rows = Insights.cohortRetention(Tables.events(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val weeks = r.getAs[Int]("weeks_since")
      val rate = r.getAs[Double]("retention_rate")
      assert(rate > 0 && rate <= 1.0, s"rate out of range: $r")
      if (weeks == 0) assert(rate == 1.0, s"week-0 cohort not full: $r")
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_size"))
    }
  }

  test("rfm quartiles are balanced and segment rules hold") {
    val rows = Insights.customerRfm(Tables.orders(spark, sf)).collect()
    val n = rows.length
    assert(n > 0)
    // ntile(4) buckets differ in size by at most 1
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Int](c)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$c unbalanced: $sizes")
    }
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
        r.getAs[Int]("m_score"))
      val seg = r.getAs[String]("segment")
      if (rs == 4 && fs == 4 && ms == 4) assert(seg == "champion")
      else if (rs == 1) assert(seg == "at_risk")
      assert(r.getAs[Int]("recency_days") >= 0)
    }
  }

  test("rfm distributed quartiles ≡ the window form (r17 pivot)") {
    // the customerRfm WindowBytesPivot switch is pure cost policy: the
    // distributed composition (three chained globalNtile passes, the
    // >512MB branch) must emit exactly the window form's rows
    val out = Insights.customerRfm(Tables.orders(spark, sf)) // window path
    val per = out.select(col("customer_id"), col("recency_days"),
      col("frequency"), col("monetary"))
    val s1 = Dist.globalNtile(per,
      Seq(col("recency_days").desc, col("customer_id")), 4, 32, "r_score")
    val s2 = Dist.globalNtile(s1,
      Seq(col("frequency").asc, col("customer_id")), 4, 32, "f_score")
    val dist = Dist.globalNtile(s2,
      Seq(col("monetary").asc, col("customer_id")), 4, 32, "m_score")
    assert(Dist.multisetEqual(
      out.select(col("customer_id"), col("r_score"), col("f_score"),
        col("m_score")),
      dist.select(col("customer_id"), col("r_score"), col("f_score"),
        col("m_score"))))
  }

  test("pareto distributed running sum ≡ the window form (r17 pivot)") {
    val out = Insights.supplierPareto(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf)) // window path at test scale
    // rebuild the distributed branch's (rnk, cum_share, in_top80) and
    // compare the full emitted frame
    import org.apache.spark.sql.types.DecimalType
    val rev = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("revenue"))
      .join(Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_name")), Seq("s_suppkey"))
    val dist = Dist.globalRunningSum(rev,
        Seq(col("revenue").desc, col("s_suppkey")), col("revenue"), 32,
        "_rnk_l", "cum", "total")
      .withColumn("rnk", col("_rnk_l").cast("int"))
      .withColumn("in_top80", col("cum") * lit(5) <= col("total") * lit(4))
      .select(col("rnk"), col("s_suppkey"), col("s_name"),
        col("revenue").cast("double").as("revenue"),
        (col("cum").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        col("in_top80"))
    assert(out.schema == dist.schema,
      s"emitted schema drift: ${out.schema} vs ${dist.schema}")
    assert(Dist.multisetEqual(out, dist))
  }

  test("table profile matches direct aggregates for a spot column") {
    val prof = Insights.tableProfile(Tables.orders(spark, sf))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof.size == 6)
    val direct = Tables.orders(spark, sf).agg(
      count(lit(1)), countDistinct(col("o_custkey")),
      min(col("o_custkey")), max(col("o_custkey"))).head()
    val row = prof("o_custkey")
    assert(row.getAs[Long]("n_rows") == direct.getLong(0))
    assert(row.getAs[Long]("n_distinct") == direct.getLong(1))
    assert(row.getAs[String]("min_value") == direct.getLong(2).toString)
    assert(row.getAs[String]("max_value") == direct.getLong(3).toString)
    assert(prof.values.forall(_.getAs[Long]("n_nulls") == 0L))
  }

  test("daily anomalies: z-scores standardize the revenue series") {
    val rows = Insights.dailyAnomalies(Tables.orders(spark, sf)).collect()
    assert(rows.nonEmpty)
    val zs = rows.map(_.getAs[Double]("z_score"))
    // population z-scores sum to ~0 and have unit variance
    assert(math.abs(zs.sum / zs.length) < 1e-9)
    val varZ = zs.map(z => z * z).sum / zs.length
    assert(math.abs(varZ - 1.0) < 1e-6, s"var(z)=$varZ")
    // flags agree with the threshold
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") ==
        (math.abs(r.getAs[Double]("z_score")) > 2.5))
    }
  }
}
