package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pagerank

class PagerankSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  test("pagerank invariants: leaky mass, isolated-node floor, determinism") {
    val out = Pagerank.docsPagerank(docs).collect()
    val n = docs.count()
    val init = Pagerank.Scale / n
    val base = 15L * init / 100L
    assert(out.length == n)
    // every node receives at least the teleport base; isolated nodes exactly it
    out.foreach { r =>
      val rank = r.getAs[Long]("rank_scaled")
      assert(rank >= base)
      if (r.getAs[Long]("degree") == 0L) assert(rank == base)
    }
    // leaky formulation: total mass never exceeds the initial total
    assert(out.map(_.getAs[Long]("rank_scaled")).sum <= init * n)
    // higher-degree hubs outrank isolated nodes
    val hub = out.maxBy(_.getAs[Long]("degree"))
    assert(hub.getAs[Long]("rank_scaled") > base)
    // bit-determinism across a fresh evaluation
    val again = Pagerank.docsPagerank(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_scaled")).toMap
    out.foreach(r =>
      assert(again(r.getLong(0)) == r.getAs[Long]("rank_scaled")))
  }
}
