package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** Physical-encoding contract of the versioned lake's manifest log:
  * commits between checkpoints are stored as line deltas against their
  * parent, checkpoints (and v1) as full snapshots, and vacuum re-roots
  * the oldest retained version so delta chains never dangle past the
  * retention floor.
  */
class ManifestDeltaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val fsys = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def raw(path: String, v: Int): Seq[String] = {
    val in = fsys.open(new org.apache.hadoop.fs.Path(
      f"$path/_log/v$v%06d.txt"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private def isDelta(path: String, v: Int): Boolean =
    raw(path, v).headOption.exists(_.startsWith("format\tdelta\t"))

  test("between-checkpoint commits are deltas; checkpoints are full") {
    val path = graft.sources.Scratch.dir("mdelta_enc_spec")
    VersionedLake.upsert(spark, path,
      (1L to 10L).map(i => (i, s"v$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    (1 to 9).foreach { i => // versions 2..10
      VersionedLake.dvUpsert(spark, path,
        Seq((i.toLong, s"u$i", 100L + i, false))
          .toDF("k", "x", "seq", "_deleted"), Seq("k"), "seq")
    }
    val K = VersionedLake.ManifestCheckpointInterval
    VersionedLake.versions(spark, path).foreach { v =>
      if (v <= 1 || v % K == 0)
        assert(!isDelta(path, v), s"v$v should be a full snapshot")
      else assert(isDelta(path, v), s"v$v should be a delta")
    }
    // resolution reproduces state at every version: spot-check tip and
    // a mid-chain version against reads
    assert(VersionedLake.read(spark, path).count() == 10)
    val v5 = VersionedLake.read(spark, path, Some(5))
      .select("k", "x").as[(Long, String)].collect().toMap
    // v5 = v1 + updates of k1..k4
    assert(v5(3L) == "u3" && v5(7L) == "v7", s"wrong v5 state: $v5")
    // a delta's physical form is change-scale: far fewer lines than
    // the resolved manifest it represents
    val tip = VersionedLake.versions(spark, path).last
    val lastDelta = (2 to tip).filter(v => v % K != 0).max
    assert(raw(path, lastDelta).length <
      VersionedLake.resolvedManifest(spark, path, lastDelta).length,
      "delta not smaller than the snapshot it encodes")
  }

  test("vacuum re-roots a delta floor; retained chain stays readable") {
    val path = graft.sources.Scratch.dir("mdelta_vac_spec")
    VersionedLake.upsert(spark, path,
      (1L to 6L).map(i => (i, s"v$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    (1 to 5).foreach { i => // versions 2..6, all deltas (K=8)
      VersionedLake.dvUpsert(spark, path,
        Seq((i.toLong, s"u$i", 100L + i, false))
          .toDF("k", "x", "seq", "_deleted"), Seq("k"), "seq")
    }
    assert(isDelta(path, 4))
    VersionedLake.vacuum(spark, path, retainLast = 3)
    assert(VersionedLake.versions(spark, path) == Seq(4, 5, 6))
    // the floor was re-encoded full; its logical content is unchanged
    assert(!isDelta(path, 4), "vacuum left the floor delta-encoded")
    val v4 = VersionedLake.read(spark, path, Some(4))
      .select("k", "x").as[(Long, String)].collect().toMap
    assert(v4 == Map(1L -> "u1", 2L -> "u2", 3L -> "u3", 4L -> "v4",
      5L -> "v5", 6L -> "v6"), s"wrong re-rooted state: $v4")
    // newer deltas still resolve through the re-rooted floor
    val tipState = VersionedLake.read(spark, path)
      .select("k", "x").as[(Long, String)].collect().toMap
    assert(tipState(5L) == "u5" && tipState(6L) == "v6")
  }
}
