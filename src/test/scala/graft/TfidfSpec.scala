package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TfidfRetrieval

class TfidfSpec extends AnyFunSuite {
  import TestSpark._

  test("every probe gets k ranked neighbors, cosines in (0,1], ranks dense") {
    val out = TfidfRetrieval.tfidfTopk(Tables.documents(spark, sf))
      .collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.head == 1 && ranks.toSeq == (1 to ranks.length))
      assert(ranks.length <= TfidfRetrieval.K)
      // ranked by cosine descending
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      rows.foreach(r => assert(r.getDouble(3) > 0.0 &&
        r.getDouble(3) <= 1.0 + 1e-12))
    }
    // probes are exactly the ProbeMod-selected docs that have neighbors
    assert(byProbe.keySet.forall(_ % TfidfRetrieval.ProbeMod == 0))
  }

  test("an exact duplicate scores cosine 1.0 at rank 1") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "alpha epsilon iota kappa")).toDF("doc_id", "text")
    val out = TfidfRetrieval.tfidfTopk(docs)
      .filter(col("probe_id") === 0L).orderBy(col("rank")).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(2) == 1L)
    assert(math.abs(out.head.getDouble(3) - 1.0) < 1e-12)
  }
}
