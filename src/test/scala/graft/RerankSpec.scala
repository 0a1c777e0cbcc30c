package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}

class RerankSpec extends AnyFunSuite {
  import TestSpark._

  test("exact stage emits the TRUE cosine for every reranked pair") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    // brute force over ALL pairs = the exact-cosine truth map
    val truth = Similarity.bruteForceTopK(emb, k = n)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val rerank = Pq.ivfPqRerank(emb, c = n).collect()
    assert(rerank.nonEmpty)
    rerank.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // bit-identical: the exact stage shares brute force's fold order
      assert(truth(key) == r.getDouble(3),
        s"pair $key: rerank ${r.getDouble(3)} != exact ${truth(key)}")
    }
  }

  test("default candidate width emits k exact-ordered rows per probe") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Pq.ivfPqRerank(emb).collect()
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.foreach { case (_, rs) =>
      assert(rs.length == Pq.K)
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.sameElements(cosines.sorted(Ordering[Double].reverse)))
    }
  }
}
