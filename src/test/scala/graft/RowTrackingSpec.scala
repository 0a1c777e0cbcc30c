package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

class RowTrackingSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def ids(dir: String): Map[Long, Long] =
    VersionedLake.readWithRowIds(spark, dir)
      .select(col("id"), col("row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("backfill assigns distinct ids; updates inherit; inserts go above hwm") {
    import spark.implicits._
    val dir = freshDir("rowid")
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "payload", "seq")
    VersionedLake.upsert(spark, dir, base, Seq("id"), "seq")
    VersionedLake.enableRowTracking(spark, dir)
    val a = ids(dir)
    assert(a.size == 3 && a.values.toSet.size == 3)
    val hwm = a.values.max
    // update 2, delete 3, insert 4
    val upd = Seq((2L, "b2", 2L, false), (3L, "c", 2L, true),
      (4L, "d", 2L, false)).toDF("id", "payload", "seq", "_deleted")
    VersionedLake.upsert(spark, dir, upd, Seq("id"), "seq")
    val b = ids(dir)
    assert(b(1L) == a(1L) && b(2L) == a(2L), "surviving keys keep ids")
    assert(!b.contains(3L))
    assert(b(4L) > hwm, "fresh id above the backfill hwm")
    // MOR path inherits too
    val mor = Seq((2L, "b3", 3L, false), (5L, "e", 3L, false))
      .toDF("id", "payload", "seq", "_deleted")
    VersionedLake.dvUpsert(spark, dir, mor, Seq("id"), "seq")
    val c = ids(dir)
    assert(c(2L) == a(2L), "MOR update inherits")
    assert(c(5L) > b.values.max, "MOR insert draws fresh")
    // rewrites preserve identity bit-for-bit
    VersionedLake.compactDvs(spark, dir)
    VersionedLake.optimizeSmallFiles(spark, dir)
    assert(ids(dir) == c)
    // and the logical read surface never leaks the hidden column
    assert(!VersionedLake.read(spark, dir).columns.contains("_row_id"))
  }

  test("a caller column named _row_id is refused") {
    import spark.implicits._
    val dir = freshDir("rowid_resv")
    val bad = Seq((1L, 1L, 2L)).toDF("id", "seq", "_row_id")
    val e = intercept[IllegalArgumentException] {
      VersionedLake.upsert(spark, dir, bad, Seq("id"), "seq")
    }
    assert(e.getMessage.contains("_row_id"))
  }

  test("hwm is read-modify-write: rebase over a concurrent allocation refuses") {
    import spark.implicits._
    val dir = freshDir("rowid_occ")
    VersionedLake.upsert(spark, dir,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "payload", "seq"),
      Seq("id"), "seq")
    VersionedLake.enableRowTracking(spark, dir)
    // two writers allocate from the same snapshot on DISJOINT keys —
    // without the prop guard the second would rebase and publish an
    // overlapping id range; with it, the loser must re-run
    val p1 = VersionedLake.prepare(spark, dir,
      Seq((10L, "x", 2L)).toDF("id", "payload", "seq"), Seq("id"), "seq")
    val p2 = VersionedLake.prepare(spark, dir,
      Seq((20L, "y", 2L)).toDF("id", "payload", "seq"), Seq("id"), "seq")
    VersionedLake.commitPending(spark, dir, p1)
    intercept[VersionedLake.ConcurrentWriteConflict] {
      VersionedLake.commitPending(spark, dir, p2)
    }
    // the plain upsert surface retries from the new snapshot and the
    // final ids are still collision-free
    VersionedLake.upsert(spark, dir,
      Seq((20L, "y", 2L)).toDF("id", "payload", "seq"), Seq("id"), "seq")
    val m = ids(dir)
    assert(m.size == 4 && m.values.toSet.size == 4)
  }
}
