package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-quantization ANN: signature packing vs the driver-side
  * reference encoder, the native hamming kernel, and the in-gate
  * recall floor.
  */
class BqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("engine signatures equal the reference encoder on real vectors") {
    val emb = Tables.embeddings(spark, sf).limit(10)
    val rows = graft.operators.Bq.signatures(emb)
      .select("vec_id", "v", "sig").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Seq[Double]]("v").toArray
      val got = r.getAs[Seq[Long]]("sig").toArray
      val want = graft.operators.Bq.referenceSignature(v)
      assert(got.sameElements(want),
        s"sig mismatch for vec ${r.getLong(0)}: " +
          s"${got.mkString(",")} vs ${want.mkString(",")}")
    }
  }

  test("hamming_words: XOR+popcount per word, null on malformed input") {
    val df = Seq(
      (Array(0L, -1L), Array(0L, 0L)),              // 64 differing bits
      (Array(5L, 12L), Array(6L, 12L)),             // 101^110=011 → 2
      (Array(Long.MinValue, 0L), Array(0L, 0L))     // sign bit counts
    ).toDF("a", "b")
    val got = df.select(call_function("hamming_words", col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(64, 2, 1), got.toString)
    val mismatch = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
      .select(call_function("hamming_words", col("a"), col("b")))
      .collect().head
    assert(mismatch.isNullAt(0), "length mismatch must be null")
  }

  test("recall floor vs exact truth holds on the real corpus") {
    val emb = Tables.embeddings(spark, sf)
    val out = graft.operators.Bq.bqRerankGate(emb) // asserts the floor
    val probes = emb.filter(col("vec_id") % 50 === 0).count()
    assert(out.count() == probes * graft.operators.Bq.K)
    // ranks are exactly 1..K per probe and hamming is within range
    val ranks = out.groupBy(col("probe_id"))
      .agg(collect_set(col("rank")).as("rs")).collect()
    assert(ranks.forall(_.getAs[Seq[Int]]("rs").sorted ==
      (1 to graft.operators.Bq.K)))
    assert(out.filter(col("hamming") < 0 ||
      col("hamming") > graft.operators.Bq.Bits).isEmpty)
  }

  test("IVF-routed BQ: routing-bounded recall floor holds, shape is exact") {
    val emb = Tables.embeddings(spark, sf)
    val out = graft.operators.Bq.bqIvfGate(emb) // asserts the floor
    val probes = emb.filter(col("vec_id") % 50 === 0).count()
    assert(out.count() == probes * graft.operators.Bq.K)
    // the routed path's candidates are a SUBSET of the unrouted scan's
    // corpus, so per (probe, neighbor) the hamming must agree with the
    // full-scan variant wherever both emit the pair
    val full = graft.operators.Bq.bqRerank(emb)
      .select(col("probe_id"), col("neighbor_id"),
        col("hamming").as("h_full"))
    val joined = out.join(full, Seq("probe_id", "neighbor_id"))
    assert(joined.filter(col("hamming") =!= col("h_full")).isEmpty,
      "routed and unrouted hamming disagree on shared pairs")
  }

  test("the parity plane family is non-degenerate (the bit-32 regression guard)") {
    // 4-unique-planes was the failure mode twice (bit 0, then bit 32):
    // assert the family stays diverse so a future "simplification" of
    // the sign derivation cannot silently reintroduce it
    val fam = (0 until 256).map { p =>
      graft.operators.Similarity.planeSigns(p, 64).toSeq
    }
    assert(fam.distinct.size == 256,
      s"plane family degenerated: ${fam.distinct.size}/256 unique")
  }
}
