package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomSkip, Scratch}

class BloomSkipSpec extends AnyFunSuite {
  import TestSpark._

  test("bloom manifest prunes files and the lookup stays exact") {
    val path = Scratch.dir("bloom_skip_spec")
    val li = Tables.lineitem(spark, sf)
    BloomSkip.writeWithBlooms(li, path, "l_shipdate", "l_orderkey",
      numFiles = 16)
    val keys = li.filter(pmod(col("l_orderkey"), lit(5000L)) === 0)
      .select(col("l_orderkey")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(keys.nonEmpty)
    val (kept, total) = BloomSkip.selectFiles(spark, path, keys)
    assert(total == 16L)
    assert(kept.nonEmpty)
    val got = BloomSkip.prunedLookup(spark, path, "l_orderkey", keys)
      .groupBy(col("l_orderkey")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = li.filter(col("l_orderkey").isin(keys: _*))
      .groupBy(col("l_orderkey")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("a key absent from the table keeps zero files (no false negatives either way)") {
    val path = Scratch.dir("bloom_skip_spec_neg")
    val li = Tables.lineitem(spark, sf).limit(1000)
    BloomSkip.writeWithBlooms(li, path, "l_shipdate", "l_orderkey",
      numFiles = 4)
    // a key far outside the domain: bloom may false-positive in theory,
    // but the exact re-filter must return nothing either way
    val out = BloomSkip.prunedLookup(spark, path, "l_orderkey",
      Seq(Long.MaxValue - 7))
    assert(out.count() == 0L)
  }
}
