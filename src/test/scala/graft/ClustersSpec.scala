package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clusters, Decontaminate}

class ClustersSpec extends AnyFunSuite {
  import TestSpark._

  test("connected components labels a known graph correctly") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {5,6} (pair), {7} (singleton)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val nodes = (1L to 7L).toDF("id")
    val got = Clusters.connectedComponents(edges, "a", "b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("large-star/small-star: 10k-node path graph converges in O(log n) rounds") {
    import spark.implicits._
    val n = 10000
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val nodes = (1L to n.toLong).toDF("id")
    val (labels, rounds) =
      Clusters.starComponents(edges, "a", "b", nodes, "id", 40)
    // diameter 9999: propagation would need ~5000 two-hop rounds; the
    // star alternation must land in the O(log n) regime (log2 n ≈ 13.3)
    assert(rounds <= 30, s"took $rounds rounds — not O(log n)")
    val got = labels.collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 1L), "path graph is one component")
  }

  test("star labels equal propagation labels on shallow graphs") {
    import spark.implicits._
    // chain + triangle + pair + singletons (incl. an isolated high id)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
      (8L, 9L), (9L, 10L), (10L, 8L)).toDF("a", "b")
    val nodes = (1L to 12L).toDF("id")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = toMap(Clusters.connectedComponents(edges, "a", "b", nodes, "id"))
    val star = toMap(Clusters.connectedComponentsStar(edges, "a", "b", nodes, "id"))
    assert(prop == star)
    assert(star(10L) == 8L && star(4L) == 1L && star(12L) == 12L)
  }

  test("propagation escapes to star on a deep path instead of failing") {
    import spark.implicits._
    // diameter 299 > 2·2 rounds: the old behavior threw; now the escape
    // path must produce the correct single component
    val edges = (1 until 300).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val nodes = (1L to 300L).toDF("id")
    val got = Clusters.connectedComponents(edges, "a", "b", nodes, "id",
      maxIters = 2).collect()
    assert(got.length == 300)
    assert(got.forall(_.getLong(1) == 1L))
  }

  test("cluster assignment equals connected components of the BRUTE-FORCE relation") {
    val docs = Tables.documents(spark, sf)
    val comp = Clusters.dupClusters(docs)
    val byDoc = comp.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc labeled exactly once
    assert(byDoc.size == docs.count())
    // brute-force all-pairs edges at 4/5 — the complete relation the
    // clusters now build on (the blocked generator misses bucket-
    // straddling pairs; clusters over it were under-merged)
    val base = docs.select(col("doc_id"),
      graft.operators.Dedup.hashedNgrams(spark,
        graft.operators.Dedup.normText(col("text")), 1).as("grams"))
    val a = base.select(col("doc_id").as("doc_a"), col("grams").as("ga"))
    val b = base.select(col("doc_id").as("doc_b"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb"))).cast("double")
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j",
        inter / ((size(col("ga")) + size(col("gb"))).cast("double") - inter))
      .filter(col("j") * 5.0 >= 4.0)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(brute.nonEmpty)
    // union-find over the brute edges: the reference labeling
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brute.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val expected = byDoc.keys.map { id =>
      // min-id labeling: find() roots at the min because union always
      // parents the larger root under the smaller
      id -> find(id)
    }.toMap
    assert(byDoc == expected,
      "cluster labels differ from the brute-force components")
  }

  test("corpus packing: packs respect the token budget modulo one doc") {
    val docs = Tables.documents(spark, sf)
    val packed = graft.operators.TextAnalysis.packDocs(docs, 2048)
    val perPack = packed.groupBy("lang", "pack_id")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
      .collect()
    perPack.foreach { r =>
      // running-sum packing: a pack overflows by at most one doc's tail
      assert(r.getLong(2) < 2048 + r.getLong(3),
        s"pack ${r.get(1)} total ${r.getLong(2)} exceeds budget+doc")
    }
    assert(packed.count() == docs.count())
  }

  test("corpus vocab: df bounded by corpus size and by cf") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val vocab = graft.operators.TextAnalysis.corpusVocab(docs).collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      val (df, cf) = (r.getLong(1), r.getLong(2))
      assert(df >= 5 && df <= n && cf >= df)
    }
  }

  test("corpus_clean: composition invariants hold") {
    val docs = Tables.documents(spark, sf)
    val cleaned = graft.operators.TextAnalysis.corpusClean(docs).collect()
    assert(cleaned.nonEmpty)
    val ids = cleaned.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate keepers emitted")
    // every kept doc is in the train split and inside the length gate
    cleaned.foreach { r =>
      assert(r.getString(3) == "train")
      val n = r.getLong(2)
      assert(n >= 100 && n <= 4000, s"doc ${r.getLong(0)} len $n outside gate")
    }
    // keeper property: no kept doc shares normalized content with a
    // smaller doc_id (it IS the minimum of its dup group)
    val keyOf = graft.operators.Dedup.exact(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // content_key -> keeper
    assert(keyOf.values.toSet.intersect(ids.toSet).size == ids.length,
      "a non-keeper survived cleaning")
  }

  test("decontamination: containment bounded and split-consistent") {
    val docs = Tables.documents(spark, sf)
    val hits = Decontaminate.contamination(docs).collect()
    assert(hits.nonEmpty, "expected contamination in the synthetic corpus")
    val split = graft.operators.TextAnalysis.corpusSplit(docs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { r =>
      val (te, tr) = (r.getLong(0), r.getLong(1))
      assert(split(te) == "test" && split(tr) == "train")
      val c = r.getDouble(3)
      assert(c >= 0.5 && c <= 1.0, s"containment $c out of range")
      assert(r.getLong(2) >= 1)
    }
  }

  test("canonical selection keeps exactly the best-quality doc per cluster") {
    val rows = graft.operators.Clusters.canonicalDocs(
      Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_.getAs[Boolean]("is_keeper"))
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val bestQ = members.map(_.getAs[Double]("quality_score")).max
      assert(keepers.head.getAs[Double]("quality_score") == bestQ)
      assert(members.forall(_.getAs[Long]("cluster_size") == members.length))
    }
    // keepers cover every cluster; discarded docs only exist in size>1 clusters
    rows.filter(r => !r.getAs[Boolean]("is_keeper"))
      .foreach(r => assert(r.getAs[Long]("cluster_size") > 1))
  }
}
