package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clusters, DocsGraph, PrefixJoin}

class DocsGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("degree-ordered triangle count matches brute force at sf") {
    val docs = Tables.documents(spark, sf)
    val got = DocsGraph.triangleCounts(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute force: a<b<c three-way join over the k-NN support edges
    val pairs = PrefixJoin.knnGraph(docs)
      .select(least(col("doc_id"), col("neighbor")),
        greatest(col("doc_id"), col("neighbor"))).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    var expected = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- pairs
      c <- nodes if b < c && pairs.contains((a, c)) && pairs.contains((b, c))
    } {
      expected = expected
        .updated(a, expected(a) + 1)
        .updated(b, expected(b) + 1)
        .updated(c, expected(c) + 1)
    }
    assert(got == expected.filter(_._2 > 0))
  }

  test("component size histogram accounts for every document") {
    val docs = Tables.documents(spark, sf)
    val stats = DocsGraph.ccStats(docs).collect()
    val totalDocs = stats.map(_.getLong(2)).sum
    assert(totalDocs == docs.count())
    // n_docs = size * n_clusters row-wise
    stats.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
    }
    // cross-check against the cluster labels directly
    val labelled = Clusters.dupClusters(docs)
      .select(col("cluster_id"), col("cluster_size")).distinct()
      .groupBy(col("cluster_size")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stats.map(r => (r.getLong(0), r.getLong(1))).toMap == labelled)
  }
}
