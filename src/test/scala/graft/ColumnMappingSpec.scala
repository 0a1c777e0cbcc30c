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

  test("rename destination must be free in the full logical schema") {
    val path = graft.sources.Scratch.dir("colmap_dst_spec")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, i * 1.0, s"p$i", i)).toDF("k", "x", "p", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    // renaming onto an existing PLAIN column (not just a rename-map
    // key) must be refused — it would alias two physical columns
    intercept[IllegalArgumentException] {
      VersionedLake.renameColumn(spark, path, "x", "p")
    }
    // a batch re-introducing a renamed column's physical slot is refused
    VersionedLake.renameColumn(spark, path, "x", "y")
    intercept[IllegalArgumentException] {
      VersionedLake.upsert(spark, path,
        Seq((5L, 5.0, "p5", 5.0, 5L)).toDF("k", "y", "p", "x", "seq"),
        Seq("k"), "seq", numBuckets = 2)
    }
  }

  test("drop column: hidden now, visible via time travel, slot reserved") {
    val path = graft.sources.Scratch.dir("colmap_drop_spec")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, i * 1.0, s"p$i", i)).toDF("k", "x", "p", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    val dataV1 = VersionedLake.resolvedManifest(spark, path, 1)
      .filter(l => l.nonEmpty && !l.contains("\t"))
    VersionedLake.dropColumn(spark, path, "p")
    // metadata-only: same data lines
    val dataV2 = VersionedLake.resolvedManifest(spark, path, 2)
      .filter(l => l.nonEmpty && !l.contains("\t"))
    assert(dataV2 == dataV1, "drop moved data files")
    assert(!VersionedLake.read(spark, path).columns.contains("p"))
    assert(VersionedLake.read(spark, path, Some(1)).columns.contains("p"))
    // writers cannot re-introduce the retained physical slot
    intercept[IllegalArgumentException] {
      VersionedLake.upsert(spark, path,
        Seq((5L, 5.0, "px", 5L)).toDF("k", "x", "p", "seq"),
        Seq("k"), "seq", numBuckets = 2)
    }
    // nor rename another column onto it
    intercept[IllegalArgumentException] {
      VersionedLake.renameColumn(spark, path, "x", "p")
    }
    // a dropped-column-free write still works and reads clean
    VersionedLake.dvUpsert(spark, path,
      Seq((5L, 5.0, 5L)).toDF("k", "x", "seq"), Seq("k"), "seq")
    val cols = VersionedLake.read(spark, path).columns.toSet
    assert(!cols.contains("p") && cols == Set("k", "x", "seq"))
    // constraints referencing the column block the drop
    VersionedLake.addConstraint(spark, path, "xpos", "x >= 0")
    intercept[IllegalArgumentException] {
      VersionedLake.dropColumn(spark, path, "x")
    }
  }

  test("type widening: upcast reads, narrow time travel, wide appends") {
    val path = graft.sources.Scratch.dir("colmap_widen_spec")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, i.toInt, i)).toDF("k", "n", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    // illegal narrowing / lossy promotion refused
    intercept[IllegalArgumentException] {
      VersionedLake.widenColumn(spark, path, "k", "double") // long→double lossy
    }
    VersionedLake.widenColumn(spark, path, "n", "long")
    assert(VersionedLake.read(spark, path).schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(VersionedLake.read(spark, path, Some(1)).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // append values beyond int32 range; scan mixes int32/int64 files
    VersionedLake.dvUpsert(spark, path,
      Seq((9L, 5000000001L, 9L)).toDF("k", "n", "seq"), Seq("k"), "seq")
    val byK = VersionedLake.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("n")).toMap
    assert(byK == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      9L -> 5000000001L), byK.toString)
    // compaction folds the mixed encodings and stays correct
    VersionedLake.optimizeSmallFiles(spark, path)
    val byK2 = VersionedLake.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("n")).toMap
    assert(byK2 == byK, "compaction changed widened values")
  }
}
