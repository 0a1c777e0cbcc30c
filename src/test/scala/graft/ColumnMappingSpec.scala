package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** Column mapping: a rename is a metadata-only commit; every read and
  * write surface speaks the new logical name, files keep the pinned
  * physical name, and time travel before the rename shows the old
  * schema.
  */
class ColumnMappingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("rename re-points the logical name across all surfaces") {
    val path = graft.sources.Scratch.dir("colmap_spec")
    VersionedLake.upsert(spark, path,
      (1L to 10L).map(i => (i, i * 10.0, i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.renameColumn(spark, path, "x", "y")
    // read exposes the new name; time travel to v1 the old one
    assert(VersionedLake.read(spark, path).columns.contains("y"))
    assert(!VersionedLake.read(spark, path).columns.contains("x"))
    assert(VersionedLake.read(spark, path, Some(1)).columns.contains("x"))
    // MOR write speaking the new name resolves against old files
    VersionedLake.dvUpsert(spark, path,
      Seq((3L, 999.0, 100L)).toDF("k", "y", "seq"), Seq("k"), "seq")
    val state = VersionedLake.read(spark, path)
      .select("k", "y").as[(Long, Double)].collect().toMap
    assert(state(3L) == 999.0 && state(7L) == 70.0, state.toString)
    // point lookup and predicate skipping speak logical names too
    val got = VersionedLake.readKeys(spark, path, Seq(3L).toDF("k"),
      Seq("k")).select("y").as[Double].head()
    assert(got == 999.0)
    val ranged = VersionedLake.readWhere(spark, path, "y >= 999.0")
      .select("k").as[Long].collect().toSeq
    assert(ranged == Seq(3L))
    // trickle delete by logical key name
    VersionedLake.dvDelete(spark, path, Seq(5L).toDF("k"), Seq("k"))
    assert(!VersionedLake.read(spark, path).select("k").as[Long]
      .collect().contains(5L))
  }

  test("chained renames pin the original physical name") {
    val path = graft.sources.Scratch.dir("colmap_chain_spec")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, s"v$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.renameColumn(spark, path, "x", "y")
    VersionedLake.renameColumn(spark, path, "y", "z")
    val tip = VersionedLake.versions(spark, path).last
    val props = VersionedLake.resolvedManifest(spark, path, tip)
      .filter(_.startsWith("prop\trename."))
    assert(props == Seq("prop\trename.z\tx"), props.toString)
    assert(VersionedLake.read(spark, path).columns.contains("z"))
  }

  test("renaming a constrained column is refused") {
    val path = graft.sources.Scratch.dir("colmap_ck_spec")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, i * 1.0, i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.addConstraint(spark, path, "xpos", "x >= 0")
    intercept[IllegalArgumentException] {
      VersionedLake.renameColumn(spark, path, "x", "y")
    }
    VersionedLake.dropConstraint(spark, path, "xpos")
    VersionedLake.renameColumn(spark, path, "x", "y")
    assert(VersionedLake.read(spark, path).columns.contains("y"))
  }
}
