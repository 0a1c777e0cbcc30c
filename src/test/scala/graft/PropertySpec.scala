package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fnv1a64
import graft.operators.{Cdc, Dedup}

/** Property-based invariants over randomized inputs (small generator
  * sizes — each case spins Spark jobs). Raw ScalaCheck generators with
  * fixed seeds: deterministic cases, no scalatestplus bridge needed.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  /** n deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    samples(g, n).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  test("fnv1a64 expression equals the reference implementation on arbitrary strings") {
    import spark.implicits._
    forAll(Gen.listOfN(6, Gen.asciiPrintableStr.map(_.take(40)))) { strs =>
      whenever(strs.nonEmpty) {
        val got = strs.toDF("s")
          .select(graft.functions.Fingerprint.fnv1a64(spark, col("s")))
          .collect().map(_.getLong(0)).toSeq
        val want = strs.map(s => Fnv1a64.hashBytes(s.getBytes("UTF-8")))
        assert(got == want)
      }
    }
  }

  test("simhash is invariant under any permutation of tokens") {
    import spark.implicits._
    forAll(Gen.zip(Gen.listOfN(10, word), Gen.long)) { case (toks, seed) =>
      whenever(toks.nonEmpty) {
        val shuffled = new scala.util.Random(seed).shuffle(toks)
        val df = Seq((1L, toks.mkString(" ")), (2L, shuffled.mkString(" ")))
          .toDF("doc_id", "text")
        val sims = Dedup.simhash(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(sims(1L) == sims(2L))
      }
    }
  }

  test("SCD2 versions always tile: one current per surviving key, ends meet next starts") {
    import spark.implicits._
    val opGen = Gen.frequency(3 -> "INSERT", 4 -> "UPDATE", 2 -> "DELETE")
    val feedGen = Gen.listOfN(15, for {
      key <- Gen.choose(1L, 3L)
      op <- opGen
      payload <- word
    } yield (key, op, payload))
    forAll(feedGen) { rows =>
      whenever(rows.nonEmpty) {
        val feed = rows.zipWithIndex.map { case ((k, op, pl), i) =>
          (k, i.toLong, op, pl)
        }.toDF("id", "seq", "op", "payload")
        val hist = Cdc.applyChanges(feed, Seq("id"), "seq", "op", Cdc.ScdType2)
          .collect()
          .map(r => (r.getAs[Long]("id"), r.getAs[Long]("__start_at"),
            Option(r.getAs[java.lang.Long]("__end_at")).map(_.toLong),
            r.getAs[Boolean]("__is_current")))
        hist.groupBy(_._1).foreach { case (_, vs) =>
          // at most one open (current) version per key
          assert(vs.count(_._3.isEmpty) <= 1)
          assert(vs.forall(v => v._4 == v._3.isEmpty))
          // sorted versions never overlap
          val sorted = vs.sortBy(_._2)
          sorted.sliding(2).foreach {
            case Array(a, b) => assert(a._3.forall(_ <= b._2))
            case _ =>
          }
        }
        // SCD1 equals the last non-deleted state derivable by hand
        val scd1 = Cdc.applyChanges(feed, Seq("id"), "seq", "op", Cdc.ScdType1)
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
        val expected = rows.zipWithIndex
          .groupBy(_._1._1)
          .flatMap { case (k, rs) =>
            val last = rs.maxBy(_._2)._1
            if (last._2 == "DELETE") None else Some(k -> last._3)
          }
        assert(scd1 == expected)
      }
    }
  }

  test("z-order interleave16 matches a bit-by-bit reference and is injective") {
    import spark.implicits._
    def ref(a: Int, b: Int): Int =
      (0 until 16).map(i => (((a >> i) & 1) << (2 * i)) |
        (((b >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    forAll(Gen.listOfN(8, Gen.zip(Gen.choose(0, 65535), Gen.choose(0, 65535)))) {
      pts =>
        val got = pts.toDF("a", "b")
          .select(graft.sources.ZOrder.interleave16(col("a"), col("b")))
          .collect().map(_.getInt(0)).toSeq
        assert(got == pts.map { case (a, b) => ref(a, b) })
        // injectivity on distinct inputs
        assert(pts.distinct.size == pts.distinct.map((ref _).tupled).distinct.size)
    }
  }

  test("chunking covers every token with stride-spaced starts") {
    import spark.implicits._
    import graft.operators.TextAnalysis.{ChunkSize, ChunkStride}
    forAll(Gen.choose(1, 130)) { n =>
      val df = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = graft.operators.TextAnalysis.chunkDocs(df)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_tokens")))
      // expected: starts at 0, stride, 2*stride … while start < n
      val expStarts = (0 until n by ChunkStride)
      assert(chunks.map(_._1).toSeq == expStarts.indices.map(_.toLong))
      // every chunk except possibly the last is exactly min(size, remaining)
      chunks.zip(expStarts).foreach { case ((_, len), start) =>
        assert(len == math.min(ChunkSize, n - start))
      }
      // coverage: last chunk reaches the final token
      val (lastIdx, lastLen) = chunks.last
      assert(lastIdx * ChunkStride + lastLen == n)
    }
  }

  test("mix sampling is nested: raising weights only adds documents") {
    val docs = Tables.documents(spark, sf)
    val lo = Map("src0" -> 0.2, "src1" -> 0.05)
    val hi = Map("src0" -> 0.9, "src1" -> 0.5)
    val idsLo = graft.operators.TextAnalysis.mixSample(docs, lo, 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val idsHi = graft.operators.TextAnalysis.mixSample(docs, hi, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsLo.nonEmpty && idsLo.size < idsHi.size)
    assert(idsLo.subsetOf(idsHi), "lower-weight sample must nest in higher")
  }

  test("ngram jaccard is symmetric-free and bounded in [0,1]") {
    import spark.implicits._
    forAll(Gen.listOfN(6, Gen.listOfN(8, word))) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, "xx", ws.mkString(" ")) }
          .toDF("doc_id", "lang", "text")
        val pairs = Dedup.ngramJaccard(df, threshold = 0.0).collect()
        pairs.foreach { r =>
          val j = r.getAs[Double]("jaccard")
          assert(j >= 0.0 && j <= 1.0)
          assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
        }
      }
    }
  }
}
