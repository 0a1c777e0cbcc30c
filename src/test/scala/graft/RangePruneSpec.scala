package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** File-skipping stats on the versioned lake: every write path records
  * per-file numeric min/max in the manifest; range reads prune to the
  * files whose recorded range intersects the predicate, conservatively
  * keeping files with missing stats; pruning composes with DVs,
  * tombstones and compaction.
  */
class RangePruneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("range read scans only intersecting files; stats follow rewrites") {
    val path = graft.sources.Scratch.dir("range_spec")
    // slice 1: keys 1..10, slice 2 (MOR append): keys 101..110
    VersionedLake.upsert(spark, path,
      (1L to 10L).map(i => (i, s"a$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.dvUpsert(spark, path,
      (101L to 110L).map(i => (i, s"b$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq")
    val m = VersionedLake.resolvedManifest(spark, path,
      VersionedLake.versions(spark, path).last)
    val dataFiles = m.filter(l => l.nonEmpty && !l.contains("\t"))
    val statsFiles = m.filter(_.startsWith("stats\t"))
      .map(_.split("\t")(1)).toSet
    assert(dataFiles.forall(statsFiles.contains),
      s"files without stats: ${dataFiles.filterNot(statsFiles.contains)}")
    // a query over slice 2 prunes slice 1's files entirely
    val cand = VersionedLake.rangeCandidates(spark, path, "k",
      Some(BigDecimal(101)), Some(BigDecimal(200)))
    assert(cand.nonEmpty && cand.size < dataFiles.size,
      s"no pruning: $cand of $dataFiles")
    val got = VersionedLake.readRange(spark, path, "k",
      Some(BigDecimal(101)), Some(BigDecimal(200)))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == (101L to 110L), s"wrong range rows: $got")

    // DV-delete inside the range: the row disappears, no rewrite
    VersionedLake.dvDelete(spark, path, Seq(105L).toDF("k"), Seq("k"))
    val afterDel = VersionedLake.readRange(spark, path, "k",
      Some(BigDecimal(101)), Some(BigDecimal(200)))
      .select("k").as[Long].collect().sorted.toSeq
    assert(afterDel == (101L to 110L).filterNot(_ == 105L))

    // a column with no recorded stats keeps every file (conservative)
    val all = VersionedLake.rangeCandidates(spark, path, "nonexistent",
      Some(BigDecimal(0)), Some(BigDecimal(1)))
    assert(all.size == VersionedLake.resolvedManifest(spark, path,
      VersionedLake.versions(spark, path).last)
      .count(l => l.nonEmpty && !l.contains("\t")))

    // compaction rewrites files and RE-DERIVES their stats
    VersionedLake.optimizeSmallFiles(spark, path)
    val m2 = VersionedLake.resolvedManifest(spark, path,
      VersionedLake.versions(spark, path).last)
    val data2 = m2.filter(l => l.nonEmpty && !l.contains("\t"))
    val stats2 = m2.filter(_.startsWith("stats\t"))
      .map(_.split("\t")(1)).toSet
    assert(data2.forall(stats2.contains), "optimize dropped stats")
    val postOpt = VersionedLake.readRange(spark, path, "k",
      Some(BigDecimal(101)), Some(BigDecimal(200)))
      .select("k").as[Long].collect().sorted.toSeq
    assert(postOpt == afterDel, "range read changed across optimize")
  }

  test("predicate extraction prunes from AND/OR/IN trees, conservatively") {
    val path = graft.sources.Scratch.dir("pred_spec")
    VersionedLake.upsert(spark, path,
      (1L to 10L).map(i => (i, i * 10.0, i)).toDF("k", "v", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.dvUpsert(spark, path,
      (101L to 110L).map(i => (i, i * 10.0, i)).toDF("k", "v", "seq"),
      Seq("k"), "seq")
    val total = VersionedLake.resolvedManifest(spark, path,
      VersionedLake.versions(spark, path).last)
      .count(l => l.nonEmpty && !l.contains("\t"))
    def cand(pred: String): Int =
      VersionedLake.predicateCandidates(spark, path, pred).size
    // a conjunct bound on k prunes the first slice
    assert(cand("k >= 100 AND v > 0.0") < total)
    // OR of two k-ranges unions the bounds: still prunes nothing here
    // (both slices covered) but stays correct
    assert(cand("k <= 5 OR k >= 105") == total)
    // OR where only one side bounds k cannot prune
    assert(cand("k >= 100 OR v < 0.0") == total)
    // IN-list bounds collapse to [min, max]
    assert(cand("k IN (103, 107)") < total)
    // row results equal a plain filter on a full read
    val viaSkip = VersionedLake.readWhere(spark, path,
      "k >= 100 AND v > 1040.0").select("k").as[Long].collect().sorted.toSeq
    assert(viaSkip == (105L to 110L), s"wrong rows: $viaSkip")
    // an equality bound on the double column prunes to slice 1 and
    // still row-filters exactly
    assert(cand("v = 30.0") < total)
    val eq = VersionedLake.readWhere(spark, path, "v = 30.0")
      .select("k").as[Long].collect().toSeq
    assert(eq == Seq(3L))
  }
}
