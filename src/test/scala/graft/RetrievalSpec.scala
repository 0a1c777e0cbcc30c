package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("hybrid RRF: k rows per probe, score is the two-slot formula") {
    val out = Retrieval.hybridRrf(docs, emb)
      .orderBy(col("probe_id"), col("rank")).collect()
    val nProbes = emb.filter(col("vec_id") % 50 === 0).count()
    assert(out.length == nProbes * Retrieval.FuseK)
    out.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(lex.nonEmpty || vec.nonEmpty,
        "fused row with neither a lexical nor a vector rank")
      val expected =
        lex.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0)
      assert(r.getDouble(3) == expected, s"rrf_score mismatch on $r")
      assert(r.getLong(2) != r.getLong(0), "probe fused with itself")
    }
    // scores non-increasing within each probe (rank order is real)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
    // at sf0.001 the fixture must exercise BOTH modalities and the
    // overlap case (a candidate ranked by both legs)
    assert(out.exists(r => !r.isNullAt(4) && !r.isNullAt(5)),
      "no fused candidate carried both a lexical and a vector rank")
    assert(out.exists(r => r.isNullAt(4) && !r.isNullAt(5)))
  }

  test("bench override emits exactly the routed gate's rows") {
    // SparkEntry.benchOverrides swaps the registered gate (routed
    // fusion + exact-fusion agreement assertion) for the bare routed
    // fusion at bench time; the swap must be timing-only — identical
    // emitted rows — or BENCH_* would measure a different operator
    // than CORRECTNESS_* verifies.
    val gate = SparkEntry.queries("ann_hybrid_rrf_routed")(spark, sf)
    val bench = SparkEntry.benchQueries("ann_hybrid_rrf_routed")(spark, sf)
    assert(gate.collect().toSeq == bench.collect().toSeq)
  }

  test("filtered top-k: every neighbor passes the metadata predicate") {
    val out = Retrieval.filteredTopK(docs, emb)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val en = docs.filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(en.contains(r.getLong(2)),
        s"neighbor ${r.getLong(2)} is not lang=en")
      assert(r.getLong(2) != r.getLong(0), "probe returned itself")
    }
    // exactly k per probe with contiguous ranks (the en slice is far
    // larger than k at every SF)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to 5))
    }
  }

  test("matryoshka recall: bounded, exact ratio, and 1.0 at full dim") {
    val out = Retrieval.matryoshkaRecall(emb).collect()
    val nProbes = emb.filter(col("vec_id") % 50 === 0).count()
    assert(out.length == nProbes)
    out.foreach { r =>
      val m = r.getLong(1)
      assert(m >= 0 && m <= 5)
      assert(r.getDouble(2) == m.toDouble / 5.0)
    }
    // un-truncated "truncation" must agree with the exact ranks —
    // recall 1.0 everywhere (pins the two topK legs to the same
    // ranking machinery)
    Retrieval.matryoshkaRecall(emb, dPrime = 64).collect().foreach { r =>
      assert(r.getDouble(2) == 1.0, s"full-dim recall != 1.0: $r")
    }
  }

  test("context pack: contiguous prefix, budget-maximal, exact cumsum") {
    val packed = Retrieval.contextPack(docs, emb)
      .orderBy(col("probe_id"), col("position")).collect()
    assert(packed.nonEmpty)
    // the same candidates with an unbounded budget — for maximality
    val all = Retrieval.contextPack(docs, emb, budget = Int.MaxValue)
      .orderBy(col("probe_id"), col("position")).collect()
      .groupBy(_.getLong(0))
    packed.groupBy(_.getLong(0)).foreach { case (p, g) =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to sorted.length),
        s"probe $p kept set is not a rank prefix")
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(3)
        assert(r.getLong(4) == cum, s"cum_toks mismatch on $r")
      }
      assert(cum <= Retrieval.PackBudget)
      // maximal: the next-ranked candidate (if any) must overflow
      all(p).find(_.getInt(1) == sorted.length + 1).foreach { nxt =>
        assert(cum + nxt.getLong(3) > Retrieval.PackBudget,
          s"probe $p stopped early: rank ${nxt.getInt(1)} still fits")
      }
    }
  }
}
