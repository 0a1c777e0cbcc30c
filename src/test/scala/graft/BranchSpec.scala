package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** Branch refs: fork-point bookkeeping, the non-fast-forward refusal,
  * and name lifecycle errors.
  */
class BranchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mk(prefix: String): String = {
    val path = graft.sources.Scratch.dir(prefix)
    VersionedLake.upsert(spark, path,
      Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "v", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    path
  }

  test("fast-forward refused when main advanced; re-branch succeeds") {
    val path = mk("br_nonff")
    VersionedLake.createBranch(spark, path, "b1")
    VersionedLake.upsert(spark, VersionedLake.branchPath(path, "b1"),
      Seq((3L, 30.0, 2L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    // main moves underneath the branch
    VersionedLake.upsert(spark, path,
      Seq((9L, 90.0, 2L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    val e = intercept[Exception](
      VersionedLake.fastForwardBranch(spark, path, "b1"))
    assert(e.getMessage.contains("not a fast-forward"), e.getMessage)
    // the refusal changed nothing on main
    assert(VersionedLake.read(spark, path).count() == 3)
    VersionedLake.dropBranch(spark, path, "b1")
    // re-branch from the new tip and replay
    VersionedLake.createBranch(spark, path, "b2")
    VersionedLake.upsert(spark, VersionedLake.branchPath(path, "b2"),
      Seq((3L, 30.0, 3L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    VersionedLake.fastForwardBranch(spark, path, "b2")
    val ks = VersionedLake.read(spark, path).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(ks == Set(1L, 2L, 3L, 9L), s"published state: $ks")
  }

  test("branch name lifecycle errors are loud") {
    val path = mk("br_names")
    VersionedLake.createBranch(spark, path, "dup")
    assert(intercept[Exception](
      VersionedLake.createBranch(spark, path, "dup"))
      .getMessage.contains("already exists"))
    assert(intercept[Exception](
      VersionedLake.dropBranch(spark, path, "nosuch"))
      .getMessage.contains("no branch"))
    assert(VersionedLake.branches(spark, path) == Seq("dup"))
    VersionedLake.dropBranch(spark, path, "dup")
    assert(VersionedLake.branches(spark, path).isEmpty)
  }

  test("branch writes are isolated until fast-forward") {
    val path = mk("br_iso")
    val before = VersionedLake.resolvedManifest(spark, path, 1)
    VersionedLake.createBranch(spark, path, "iso")
    VersionedLake.upsert(spark, VersionedLake.branchPath(path, "iso"),
      Seq((1L, -1.0, 5L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    assert(VersionedLake.versions(spark, path) == Seq(1) &&
      VersionedLake.resolvedManifest(spark, path, 1) == before,
      "main manifest must stay bit-identical under branch writes")
    assert(VersionedLake.read(spark, path)
      .filter(col("v") < 0).isEmpty)
    VersionedLake.fastForwardBranch(spark, path, "iso")
    assert(VersionedLake.read(spark, path)
      .filter(col("k") === 1).head().getDouble(1) == -1.0)
  }
}
