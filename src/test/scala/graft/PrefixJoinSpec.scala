package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, PrefixJoin}

class PrefixJoinSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  test("prefix filtering equals the brute-force all-pairs join") {
    val viaPrefix = PrefixJoin.prefixFilterPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = docs.select(col("doc_id"),
      Dedup.hashedNgrams(spark, Dedup.normText(col("text")), 1).as("grams"))
    val a = base.select(col("doc_id").as("doc_a"), col("grams").as("ga"))
    val b = base.select(col("doc_id").as("doc_b"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb"))).cast("double")
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j",
        inter / ((size(col("ga")) + size(col("gb"))).cast("double") - inter))
      .filter(col("j") * 5.0 >= 4.0)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix == brute) // completeness AND no false positives
    assert(brute.nonEmpty)
  }

  test("blocked exact generator finds no pair prefix filtering misses") {
    // the length-bucket generator is a (possibly lossy) blocker; the
    // prefix filter is complete, so blocked ∩ threshold must be ⊆ prefix
    val prefix = PrefixJoin.prefixFilterPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.ngramJaccard(docs, n = 1, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(prefix))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    import org.apache.spark.sql.functions.{call_function, array_intersect,
      size => asize}
    import spark.implicits._
    graft.functions.IntersectCount.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def set() = Array.fill(rnd.nextInt(50))(rnd.nextLong() % 100)
        .distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
      .select(call_function("sorted_intersect_count", $"a", $"b").as("m"),
        asize(array_intersect($"a", $"b")).cast("long").as("h"))
    assert(df.filter($"m" =!= $"h").count() == 0)
    assert(df.filter($"m" > 0).count() > 0) // non-degenerate fixture
  }

  test("containment is directed: a strict subset contains, not vice versa") {
    import spark.implicits._
    // doc 1 is a strict subset of doc 2 (10 of its 11 words); doc 3
    // disjoint — Jaccard(1,2) = 10/11 but the CONTAINMENT direction
    // matters: C(1→2) = 1.0, C(2→1) = 10/11 < 17/20... both ≥ 0.85
    // here, so use a larger container where Jaccard is small
    val small = (1 to 10).map(i => s"w$i").mkString(" ")
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, "x y z")).toDF("doc_id", "text")
    val got = graft.operators.PrefixJoin.containmentPairs(docs)
      .select("contained_id", "container_id").as[(Long, Long)]
      .collect().toSet
    // Jaccard(1,2) = 10/40 = 0.25 — the Jaccard join would never pair
    // them; containment(1→2) = 1.0 must, and ONLY in that direction
    assert(got.contains((1L, 2L)), s"missing contained pair: $got")
    assert(!got.contains((2L, 1L)), s"containment not directed: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
