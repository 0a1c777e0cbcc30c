package graft

import org.apache.spark.sql.SparkSession

/** Stage-level timings for the pipeline's critical path (the enriched
  * landing dominates pipeline_manifest) — diagnostic main, run via
  * tools/run_verify.sh <sf> ignored graft.ProfilePipeline.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    val out = graft.sources.Scratch.dir("profile_pipe")

    import graft.operators.Medallion
    time("warm q1")(graft.operators.Analytics
      .q1PricingSummary(lineitem).count())
    time("enriched count")(
      Medallion.silverOrdersEnriched(orders, lineitem, events).count())
    time("enriched write")(
      Medallion.silverOrdersEnriched(orders, lineitem, events)
        .write.mode("overwrite").parquet(s"$out/enriched"))
    time("items-only write")(
      Medallion.silverOrdersEnrichedItems(orders, lineitem)
        .write.mode("overwrite").parquet(s"$out/items"))
    time("silver_payments write")(
      Medallion.silverPayments(events)
        .write.mode("overwrite").parquet(s"$out/pay"))
    time("silver_reviews write")(
      Medallion.silverReviews(events)
        .write.mode("overwrite").parquet(s"$out/rev"))
    time("enriched write (2nd)")(
      Medallion.silverOrdersEnriched(orders, lineitem, events)
        .write.mode("overwrite").parquet(s"$out/enriched2"))

    // bisect the item aggregate
    import org.apache.spark.sql.functions._
    import Medallion.{dsum, davg}
    val sl = Medallion.silverLineitem(lineitem)
    def agg1(tag: String)(aggs: Seq[org.apache.spark.sql.Column]): Unit =
      time(s"itemAgg[$tag]")(
        sl.groupBy(col("order_id")).agg(aggs.head, aggs.tail: _*)
          .write.mode("overwrite").parquet(s"$out/ia_$tag"))
    agg1("count")(Seq(count(lit(1)).as("c")))
    agg1("sums")(Seq(dsum(col("price")).as("p"), dsum(col("freight_value")).as("f"),
      dsum(col("total_item_value")).as("t"), davg(col("price")).as("ap")))
    agg1("cdist")(Seq(countDistinct(col("product_id")).as("up"),
      countDistinct(col("seller_id")).as("us")))
    agg1("cset")(Seq(array_join(sort_array(collect_set(col("return_flag"))), ",").as("rf")))
    agg1("dates")(Seq(max(col("ship_date")).as("mx"), min(col("ship_date")).as("mn")))
    agg1("all-but-cdist")(Seq(count(lit(1)).as("c"),
      dsum(col("price")).as("p"), dsum(col("freight_value")).as("f"),
      dsum(col("total_item_value")).as("t"), davg(col("price")).as("ap"),
      max(col("ship_date")).as("mx"), min(col("ship_date")).as("mn"),
      array_join(sort_array(collect_set(col("return_flag"))), ",").as("rf")))
    agg1("all-combined")(Seq(count(lit(1)).as("c"),
      countDistinct(col("product_id")).as("up"),
      countDistinct(col("seller_id")).as("us"),
      dsum(col("price")).as("p"), dsum(col("freight_value")).as("f"),
      dsum(col("total_item_value")).as("t"), davg(col("price")).as("ap"),
      max(col("ship_date")).as("mx"), min(col("ship_date")).as("mn"),
      array_join(sort_array(collect_set(col("return_flag"))), ",").as("rf")))
    time("split-join write") {
      val main = sl.groupBy(col("order_id")).agg(count(lit(1)).as("c"),
        dsum(col("price")).as("p"), dsum(col("freight_value")).as("f"),
        dsum(col("total_item_value")).as("t"), davg(col("price")).as("ap"),
        max(col("ship_date")).as("mx"), min(col("ship_date")).as("mn"),
        array_join(sort_array(collect_set(col("return_flag"))), ",").as("rf"))
      val up = sl.select(col("order_id"), col("product_id")).distinct()
        .groupBy(col("order_id")).agg(count(lit(1)).as("up"))
      val us = sl.select(col("order_id"), col("seller_id")).distinct()
        .groupBy(col("order_id")).agg(count(lit(1)).as("us"))
      main.join(up, Seq("order_id"), "left").join(us, Seq("order_id"), "left")
        .write.mode("overwrite").parquet(s"$out/ia_split")
    }
    spark.stop()
  }
}
