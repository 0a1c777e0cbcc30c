package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale bench's evidence is only as good as its synthetic inputs:
  * this spec pins the generators' determinism (two builds of the same
  * slice are row-identical — the growth curves compare like with
  * like), the planted-near-duplicate contract the recall floors
  * measure against, and the embedding value domain.
  */
class ScaleBenchSpec extends AnyFunSuite {
  import TestSpark._

  test("synthetic embeddings: deterministic, unit-free domain, iid-ish") {
    val a = ScaleBench.synthEmbeddings(spark, 200).collect()
    val b = ScaleBench.synthEmbeddings(spark, 200).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == 200)
    a.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == 64)
      assert(v.forall(x => x >= -1.0f && x <= 1.0f))
    }
    // not degenerate: values spread over the domain
    val all = a.flatMap(_.getSeq[Float](1))
    assert(all.distinct.length > 500)
  }

  test("synthetic docs: planted near-dups have jaccard above thresholds") {
    val docs = ScaleBench.synthDocs(spark, 500).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.size == 500)
    def grams(t: String): Set[String] = t.split(" ").toSet
    // every doc_id ≡ 4 (mod 5) is a one-token edit of doc_id−4
    val planted = docs.keys.filter(id => id % 5 == 4 && docs.contains(id - 4))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val (ga, gb) = (grams(docs(id)), grams(docs(id - 4)))
      val j = (ga & gb).size.toDouble / (ga | gb).size
      assert(j >= 0.9, s"planted pair ($id, ${id - 4}) jaccard $j < 0.9")
      assert(docs(id) != docs(id - 4), "planted dup must not be exact")
    }
    // non-planted neighbours are NOT near-dups (the recall denominator
    // is the planted set, so the corpus must not be accidentally dense)
    val clean = docs.keys.filter(id => id % 5 == 1 && docs.contains(id + 1))
      .take(50)
    clean.foreach { id =>
      val (ga, gb) = (grams(docs(id)), grams(docs(id + 1)))
      val j = (ga & gb).size.toDouble / (ga | gb).size
      assert(j < 0.5, s"unplanted pair ($id, ${id + 1}) jaccard $j")
    }
    // determinism
    val again = ScaleBench.synthDocs(spark, 500).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == docs)
  }
}
