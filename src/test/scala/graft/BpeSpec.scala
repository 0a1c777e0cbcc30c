package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark._

  /** Sequential left-to-right non-overlapping merge — the reference the
    * windowed islands-parity implementation must reproduce.
    */
  private def seqApply(toks: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  test("windowed merge apply equals the sequential fold, incl. overlap runs") {
    val spark0 = spark
    import spark0.implicits._
    val words = Seq("aaaa", "aaa", "ababab", "aabb", "xaay", "bb", "a")
    val wdf = words.toDF("word").withColumn("w", lit(1L))
    val toks = Bpe.charTokens(wdf)
    for ((l, r) <- Seq(("a", "a"), ("a", "b"), ("b", "b"))) {
      val got = Bpe.applyMerge(toks, l, r).collect()
        .groupBy(_.getString(0))
        .map { case (wd, rows) =>
          wd -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("tok")).toSeq
        }
      words.foreach { wd =>
        val expected = seqApply(wd.map(_.toString), l, r)
        assert(got(wd) == expected, s"word=$wd pair=($l,$r)")
      }
    }
  }

  test("bpe training is deterministic with non-increasing pair counts") {
    val a = Bpe.bpeMerges(Tables.documents(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val b = Bpe.bpeMerges(Tables.documents(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(a.toSeq == b.toSeq, "training not deterministic")
    assert(a.length == Bpe.Rounds)
    val counts = a.sortBy(_._1).map(_._4)
    assert(counts.zip(counts.tail).forall { case (x, y) => y <= x },
      s"greedy counts increased: ${counts.toSeq}")
  }
}
