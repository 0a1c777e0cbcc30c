package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftBloom
import graft.operators.BloomJoin

class BloomSpec extends AnyFunSuite {
  import TestSpark._

  test("bloom has no false negatives and a bounded false-positive rate") {
    val bits = new Array[Byte](1 << 14) // 2^17 bits
    val members = (0L until 5000L).map(i => i * 2654435761L + 17L)
    members.foreach(GraftBloom.setBits(bits, _))
    assert(members.forall(GraftBloom.mightContain(bits, _)), "false negative")
    val probes = (0L until 20000L).map(i => i * 0x9e3779b97f4a7c15L + 3L)
      .filterNot(members.contains)
    val fp = probes.count(GraftBloom.mightContain(bits, _)).toDouble / probes.size
    // 5000 keys in 131072 bits at k=5 → theoretical fp ≈ 0.2%; allow 2%
    assert(fp < 0.02, s"false-positive rate $fp")
  }

  test("bloom_build aggregate merges across partitions like a single build") {
    val spark0 = spark
    import spark0.implicits._
    val keys = (1L to 4000L).toDF("k").repartition(8)
    val distributed = keys
      .agg(call_function("bloom_build", col("k"), lit(1 << 17)))
      .head().getAs[Array[Byte]](0)
    val local = new Array[Byte]((1 << 17) / 8)
    (1L to 4000L).foreach(GraftBloom.setBits(local, _))
    assert(java.util.Arrays.equals(distributed, local),
      "distributed OR-merge differs from sequential build")
  }

  test("bloom prune rejects most non-matching fact rows but keeps the join exact") {
    val li = Tables.lineitem(spark, sf)
    val orders = Tables.orders(spark, sf)
    val hotKeys = orders.filter(col("o_totalprice") > BloomJoin.PriceCutoff)
      .select(col("o_orderkey"))
    val bloom = hotKeys
      .agg(call_function("bloom_build", col("o_orderkey"), lit(BloomJoin.NumBits)))
      .head().getAs[Array[Byte]](0)
    val total = li.count()
    val trueMatch = li.join(hotKeys, col("l_orderkey") === col("o_orderkey"))
      .count()
    val pruned = li.filter(
      call_function("bloom_contains", lit(bloom), col("l_orderkey"))).count()
    assert(pruned >= trueMatch, "bloom dropped a real match")
    // prune keeps the hot rows plus a small fp margin, far below the scan
    assert(pruned <= trueMatch + (total - trueMatch) / 50,
      s"weak prune: $pruned of $total (true $trueMatch)")
    // end to end equals the plain join
    val viaBloom = BloomJoin.bloomPrunedRevenue(orders, li)
      .orderBy(col("order_priority")).collect().toSeq
    val plain = li.join(orders.filter(col("o_totalprice") > BloomJoin.PriceCutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("order_priority"))
      .agg(graft.operators.Medallion.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"),
        countDistinct(col("o_orderkey")).as("order_count"))
      .orderBy(col("order_priority")).collect().toSeq
    assert(viaBloom == plain)
  }

  test("bloom_contains filter sits under the join in the physical plan") {
    val plan = BloomJoin.bloomPrunedRevenue(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"), s"no bloom filter in plan:\n$plan")
    val filterIdx = plan.indexOf("bloom_contains")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "bloom filter should appear below the join in the plan tree")
  }
}
