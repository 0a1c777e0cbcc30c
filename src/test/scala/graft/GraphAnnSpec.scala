package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, Similarity}

class GraphAnnSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("edge list: symmetric, knn out-degree, long links present") {
    val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val edges = GraphAnn.buildEdges(base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.nonEmpty)
    edges.foreach { case (s, d) =>
      assert(s != d, "self-loop")
      assert(edges.contains((d, s)), s"edge ($s,$d) not symmetric")
    }
    // every node carries at least its M knn out-edges, and long links
    // push SOME nodes beyond knn-only degree
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size)
    assert(outDeg.values.forall(_ >= GraphAnn.M))
    assert(outDeg.values.exists(_ > GraphAnn.M),
      "no node exceeds knn degree — long links missing")
  }

  test("distributed id-rank equals the global row_number exactly") {
    val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    // force the DISTRIBUTED branch regardless of corpus size, and
    // prove it against the plain sorted expectation; the window
    // branch is the expectation itself (bit-identical by DistSpec)
    val got = GraphAnn.rankedIds(base, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ids = base.select(col("vec_id")).collect()
      .map(_.getLong(0)).sorted
    ids.zipWithIndex.foreach { case (id, i) =>
      assert(got(id) == i.toLong, s"id $id ranked ${got(id)}, want $i")
    }
    assert(got.size == ids.length)
  }

  test("blocked knn build: edge recall vs the exact all-pairs truth") {
    // r13 verdict task 2: the gate build is LSH-blocked; the exact
    // build survives ONLY as this truth. Directed-edge recall of the
    // blocked top-M against the exact top-M must clear the floor on
    // both regimes (iid worst case; clustered is the design case where
    // bucket-mates ARE the cluster).
    val baseIid = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val fx = Similarity.clusteredFixture(emb)
    val baseCl = fx.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    def edgeRecall(base: org.apache.spark.sql.DataFrame): Double = {
      val truth = GraphAnn.buildEdgesExactKnn(base)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = GraphAnn.buildKnnBlocked(base)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val iid = edgeRecall(baseIid)
    val clustered = edgeRecall(baseCl)
    info(f"blocked-build edge recall: iid=$iid%.3f clustered=$clustered%.3f")
    // iid DIRECTED-EDGE recall is the LSH worst case (random directions
    // rarely co-bucket; r14 measured 0.422 at spec scale, 12-table config) — the
    // END-TO-END search floors in the gate stay 0.58-0.76 because long
    // links + the beam compensate, which is the architecture's point.
    // Clustered is the design case (bucket-mates ARE the cluster;
    // measured 1.000).
    assert(iid >= 0.25, f"iid edge recall $iid%.3f under floor 0.25")
    assert(clustered >= 0.8,
      f"clustered edge recall $clustered%.3f under floor 0.8")
  }

  test("beam search: k ranked rows per probe, deterministic, floors hold") {
    val out = GraphAnn.graphTopKGate(emb)
      .orderBy(col("probe_id"), col("rank"))
    val rows = out.collect()
    val nProbes = emb.filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nProbes * GraphAnn.K)
    rows.groupBy(_.getLong(0)).foreach { case (p, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to GraphAnn.K))
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
      g.foreach(r => assert(r.getLong(2) != p, "probe returned itself"))
    }
    // determinism across a second full evaluation
    val again = GraphAnn.graphTopK(emb)
      .orderBy(col("probe_id"), col("rank")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("adaptive plane count: pinned at gate Ns, widens ~log2 above") {
    // every corpus a gate runs (500, 2000, the 1600-vector old split,
    // the clustered fixture) must reproduce the pinned 6-plane config
    // EXACTLY — pins, floors and the static oracle SQL depend on it
    assert(GraphAnn.buildPlanesFor(500L) == GraphAnn.BuildPlanes)
    assert(GraphAnn.buildPlanesFor(2000L) == GraphAnn.BuildPlanes)
    assert(GraphAnn.buildPlanesFor(2048L) == GraphAnn.BuildPlanes)
    // above the pinned regime, planes grow with ceil(log2(n/target)):
    // occupancy n/2^planes stays <= BuildBucketTarget
    assert(GraphAnn.buildPlanesFor(131072L) == 12)
    assert(GraphAnn.buildPlanesFor(10000000L) == 19)
    Seq(4097L, 100000L, 10000000L, 3000000000L).foreach { n =>
      val planes = GraphAnn.buildPlanesFor(n)
      assert(n.toDouble / math.pow(2.0, planes.toDouble)
        <= GraphAnn.BuildBucketTarget,
        s"occupancy unbounded at n=$n planes=$planes")
    }
    // monotone: more corpus never narrows the blocking
    assert(GraphAnn.buildPlanesFor(4096L) <= GraphAnn.buildPlanesFor(8192L))
  }

  test("adaptive tables/rounds: pinned at gate Ns, +log2 above") {
    // gate corpora reproduce the 12-table / 4-round config exactly —
    // the oracle's unrolled round CTEs and every pin depend on it
    Seq(500L, 1600L, 2000L, 2048L).foreach { n =>
      assert(GraphAnn.buildTablesFor(n) == GraphAnn.BuildTables)
      assert(GraphAnn.roundsFor(n) == GraphAnn.Rounds)
    }
    // past the pivot: +4 tables and +1 round per corpus doubling —
    // per-node candidates grow O(log n) so iid coverage doesn't
    // collapse (the r15 scale-bench finding: 12 fixed tables measured
    // recall 0.359 < 0.4 floor at n=8000)
    assert(GraphAnn.buildTablesFor(4000L) == 16)
    assert(GraphAnn.roundsFor(4000L) == 5)
    assert(GraphAnn.buildTablesFor(8000L) == 20)
    assert(GraphAnn.roundsFor(8000L) == 6)
    assert(GraphAnn.buildTablesFor(16000L) == 24)
    assert(GraphAnn.roundsFor(16000L) == 7)
    // beam (efSearch) rides the same law: pinned at gate Ns (the
    // oracle's beam CTEs), +4 per doubling above — deeper rounds
    // alone measured 0.69/0.49/0.29 at 16k/32k/64k in the r16 sweep
    Seq(500L, 1600L, 2000L, 2048L).foreach { n =>
      assert(GraphAnn.beamFor(n) == GraphAnn.Beam)
    }
    assert(GraphAnn.beamFor(4000L) == 12)
    assert(GraphAnn.beamFor(8000L) == 16)
    assert(GraphAnn.beamFor(64000L) == 28)
  }

  test("nn-descent rounds: zero at gate Ns, grows to the cap above") {
    // zero refinement rounds at or below the pivot: gate corpora keep
    // the pinned build (and its unrolled oracle SQL) bit-identical
    Seq(500L, 1600L, 2000L, 2048L).foreach { n =>
      assert(GraphAnn.descentRoundsFor(n) == 0)
    }
    // above the pivot the LSH seed's iid edge recall decays (planes
    // grow ~log n, per-table collision decays exponentially in
    // planes), so descent depth steps in and caps at the fixed-point
    // convergence depth — not a function of n past 16k
    assert(GraphAnn.descentRoundsFor(4000L) == 1)
    assert(GraphAnn.descentRoundsFor(8000L) == 2)
    assert(GraphAnn.descentRoundsFor(16000L) == GraphAnn.DescentMaxRounds)
    assert(GraphAnn.descentRoundsFor(64000L) == GraphAnn.DescentMaxRounds)
    assert(GraphAnn.descentRoundsFor(3000000000L) ==
      GraphAnn.DescentMaxRounds)
    // skew guard: no dst-side bucket cap at gate Ns (pinned build and
    // oracle bit-identical), 4x occupancy target above — bounds the
    // candidate join at O(n·tables·cap) under ANY clustering
    Seq(500L, 1600L, 2000L, 2048L).foreach { n =>
      assert(GraphAnn.dstCapFor(n).isEmpty)
    }
    assert(GraphAnn.dstCapFor(4000L).contains(128))
    assert(GraphAnn.dstCapFor(3000000000L).contains(128))
    // entry seeding: pinned 4 at gate Ns, O(√n) deterministic sample
    // above — the single-layer answer to a flat inter-cluster
    // landscape (r16 measured routing decay 1.0/0.967/0.832 at
    // 16/64/256 iid-random centers with 4 fixed entries)
    Seq(500L, 1600L, 2000L, 2048L).foreach { n =>
      assert(GraphAnn.entriesFor(n) == GraphAnn.Entries.toLong)
    }
    assert(GraphAnn.entriesFor(4000L) == 256L)
    assert(GraphAnn.entriesFor(64000L) == 1012L)
  }

  test("nn-descent lifts blocked edge recall toward the exact knn") {
    // seed the descent with a DEGRADED blocked build (planes widened
    // past what 2k vectors occupancy-justify, tables cut to 4 — the
    // large-corpus failure regime shrunk to gate scale) and measure
    // directed-edge recall against the exact knn truth before/after:
    // descent must recover most of what the weak seed lost
    val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    base.persist()
    try {
      val truth = GraphAnn.buildEdgesExactKnn(base)
        .select(col("src"), col("dst"))
      // planes widened one past what 2k vectors occupancy-justify and
      // tables cut to half — the large-corpus seed-degradation regime
      // (exponentially decayed per-table collision, linearly fewer
      // retries) shrunk to gate scale
      val weak = GraphAnn.buildKnnBlocked(base, GraphAnn.M, 7, 6)
      val refined = GraphAnn.nnDescent(base, weak,
        GraphAnn.M, GraphAnn.DescentMaxRounds)
      val total = truth.count().toDouble
      val before = weak.intersect(truth).count() / total
      val after = refined.intersect(truth).count() / total
      info(f"edge recall: weak seed $before%.3f -> descent $after%.3f")
      assert(after > before,
        f"descent did not improve edge recall ($before%.3f -> $after%.3f)")
      assert(after >= 0.6,
        f"descent edge recall $after%.3f under 0.6 on the gate corpus")
    } finally base.unpersist(blocking = false)
  }

  test("filtered search: every neighbor passes the filter, floor holds") {
    val docs = Tables.documents(spark, sf)
    val allowed = docs.filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(allowed.nonEmpty && allowed.size < docs.count(),
      "fixture must make the filter selective but non-empty")
    val rows = GraphAnn.queries("ann_graph_filtered")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(allowed.contains(r.getLong(2)),
        s"emitted neighbor ${r.getLong(2)} fails the metadata filter")
    }
    // at most k ranked rows per probe, ranks contiguous from 1
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val ranks = g.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size))
      assert(ranks.size <= GraphAnn.K)
    }
  }

  test("incremental insert: batch-only probes, old-only wiring, floor") {
    val rows = GraphAnn.graphInsertGate(emb)
      .orderBy(col("new_id"), col("rank")).collect()
    val batch = emb
      .filter(pmod(col("vec_id"), lit(GraphAnn.BatchMod)) ===
        GraphAnn.BatchRem)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty)
    // every batch vector gets exactly M wiring rows; neighbors come
    // from the OLD graph only (never another batch member)
    assert(rows.map(_.getLong(0)).toSet == batch)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to GraphAnn.M))
    }
    rows.foreach { r =>
      assert(!batch.contains(r.getLong(2)),
        s"wired to batch member ${r.getLong(2)}")
    }
  }
}
