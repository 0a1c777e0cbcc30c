package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmeans

class KmeansSpec extends AnyFunSuite {
  import TestSpark._

  test("Lloyd rounds monotonically improve exact inertia") {
    val (out, inertias) =
      Kmeans.embKmeansWithInertia(Tables.embeddings(spark, sf))
    assert(inertias.length == Kmeans.Iters)
    // each update+reassign must not worsen the objective; the floored
    // centroid quantization can cost at most ~1e-6 relative (centroid
    // off the true mean by <1 quantum per dim), far below real movement
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + a / 1000000,
        s"inertia increased beyond quantization slack: $inertias")
    }
    assert(inertias.last < inertias.head,
      s"no improvement over ${Kmeans.Iters} rounds: $inertias")
    val rows = out.collect()
    assert(rows.length == 500)
    val clusters = rows.map(_.getLong(1)).distinct
    assert(clusters.length <= Kmeans.K && clusters.forall(c =>
      c >= 0 && c < Kmeans.K))
    // cluster_size is consistent with the assignment itself
    val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    rows.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
  }

  test("purity rows are consistent with the assignment") {
    val emb = Tables.embeddings(spark, sf)
    val purity = Kmeans.clusterPurity(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(purity.nonEmpty && purity.length <= Kmeans.K)
    purity.foreach { case (_, size, nMaj, p) =>
      assert(nMaj >= 1 && nMaj <= size)
      assert(p == nMaj.toDouble / size.toDouble && p > 0.0 && p <= 1.0)
    }
    // sizes agree with the assignment's own cluster sizes
    val sizes = Kmeans.embKmeans(emb).collect()
      .map(r => (r.getLong(1), r.getLong(2))).distinct.toMap
    purity.foreach { case (cid, size, _, _) => assert(sizes(cid) == size) }
  }

  test("clustering is deterministic across runs") {
    val emb = Tables.embeddings(spark, sf)
    val a = Kmeans.embKmeans(emb).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    val b = Kmeans.embKmeans(emb).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }
}
