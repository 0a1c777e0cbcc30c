package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Scratch, VersionedLake, Wap}

class WapSpec extends AnyFunSuite {
  import TestSpark._

  test("failed audit leaves production bit-identical; clean publishes") {
    import spark.implicits._
    val path = Scratch.dir("wap_spec")
    val clean = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("o_orderkey", "o_totalprice")
    VersionedLake.upsert(spark, path, clean, Seq("o_orderkey"),
      "o_orderkey")
    val vsBefore = VersionedLake.versions(spark, path)
    val snapBefore = VersionedLake.read(spark, path)
      .collect().map(_.toSeq).toSet
    // dirty batch: negative total + duplicate key + null key
    val dirty = Seq((Some(4L), -5.0), (Some(4L), 6.0), (None, 7.0))
      .toDF("o_orderkey", "o_totalprice")
    val v = Wap.violations(dirty)
    assert(v == 3, s"expected 3 violations (neg, dup, null), got $v")
    // audit failed -> no publish happened; prod must be untouched
    assert(VersionedLake.versions(spark, path) == vsBefore)
    assert(VersionedLake.read(spark, path)
      .collect().map(_.toSeq).toSet == snapBefore)
    // the clean re-land publishes a NEW version atomically
    val fixed = Seq((4L, 5.0)).toDF("o_orderkey", "o_totalprice")
    VersionedLake.upsert(spark, path, fixed, Seq("o_orderkey"),
      "o_orderkey")
    assert(VersionedLake.versions(spark, path).size == vsBefore.size + 1)
    assert(VersionedLake.read(spark, path).count() == 4)
  }

  test("gate flow report is internally consistent at spec scale") {
    val rows = Wap.wapPublish(spark, sf).orderBy(col("batch_id")).collect()
    assert(rows.length == 3)
    val Array(b1, b2, b3) = rows
    assert(b1.getBoolean(3) && b3.getBoolean(3)) // clean batches publish
    assert(b1.getLong(4) == b1.getLong(1)) // prod == batch1 after publish
    // dirty batch must not advance prod iff it had violations
    if (b2.getLong(2) > 0) {
      assert(!b2.getBoolean(3))
      assert(b2.getLong(4) == b1.getLong(4))
    }
    assert(b3.getLong(4) == b1.getLong(1) + b3.getLong(1))
  }
}
