package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineDedup

class LineDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("boilerplate segments are cross-doc, removal is token-exact") {
    import spark.implicits._
    // docs 1 and 2 share their first 8 tokens verbatim (boilerplate);
    // each has a unique tail; doc 3 is all-unique
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared alpha beta"),
      (2L, s"$shared gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // docs 1/2: 2 segments, 1 boilerplate (the shared 8), tail kept
    assert(byId(1L) == ((2L, 1L, 2L, 8L)))
    assert(byId(2L) == ((2L, 1L, 2L, 8L)))
    // doc 3: 1 segment, nothing removed
    assert(byId(3L) == ((1L, 0L, 4L, 0L)))
  }

  test("a fully-boilerplate doc rebuilds to the empty string") {
    import spark.implicits._
    val t = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = LineDedup.lineDedup(docs).collect()
    assert(out.length == 2)
    val fpOfEmpty = Seq("").toDF("s")
      .select(graft.functions.Fingerprint.fnv1a64(spark, col("s")))
      .head.getLong(0)
    assert(out.forall(_.getLong(5) == fpOfEmpty))
    assert(out.forall(_.getLong(3) == 0L)) // kept_tokens
  }

  test("segmentation covers every token exactly once") {
    val docs = Tables.documents(spark, sf)
    val out = LineDedup.lineDedup(docs)
    val sums = out.agg(
      sum(col("kept_tokens") + col("removed_tokens")).as("covered"))
      .head.getLong(0)
    val total = docs.select(
      sum(size(split(graft.operators.Dedup.normText(col("text")), " "))))
      .head.getLong(0)
    assert(sums == total)
  }
}
