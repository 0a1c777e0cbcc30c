package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TxnGroup, VersionedLake}

class TxnGroupSpec extends AnyFunSuite {
  import TestSpark._

  private def freshRoot(): (String, String, String) = {
    val root = Files.createTempDirectory("graft_txn").toString
    (root, s"$root/a", s"$root/b")
  }

  test("a group commit publishes both tables in one CAS; reads are all-or-nothing") {
    import spark.implicits._
    val (root, pa, pb) = freshRoot()
    VersionedLake.upsert(spark, pa,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, pb,
      Seq((1L, 10.0, 1L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    TxnGroup.create(spark, root, Map("a" -> pa, "b" -> pb))
    val contracts = Map("a" -> (Seq("id"), "seq"), "b" -> (Seq("id"), "seq"))
    val r = TxnGroup.commit(spark, root, Map(
      "a" -> Seq((2L, "a2", 2L)).toDF("id", "v", "seq"),
      "b" -> Seq((2L, 20.0, 2L)).toDF("id", "x", "seq")), contracts)
    assert(r.groupVersion == 2 && r.retries == 0)
    assert(TxnGroup.read(spark, root, "a").count() == 2)
    assert(TxnGroup.read(spark, root, "b").count() == 2)
  }

  test("chain writes outside the group stay invisible and are restored away") {
    import spark.implicits._
    val (root, pa, pb) = freshRoot()
    VersionedLake.upsert(spark, pa,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, pb,
      Seq((1L, 10.0, 1L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    TxnGroup.create(spark, root, Map("a" -> pa, "b" -> pb))
    val contracts = Map("a" -> (Seq("id"), "seq"), "b" -> (Seq("id"), "seq"))
    // simulated crashed transaction: lands on a's CHAIN only
    VersionedLake.upsert(spark, pa,
      Seq((99L, "junk", 5L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    assert(TxnGroup.read(spark, root, "a")
      .filter(col("id") === 99L).isEmpty, "junk visible through group")
    // the next group write of `a` rolls the junk back before merging
    TxnGroup.commit(spark, root,
      Map("a" -> Seq((2L, "a2", 2L)).toDF("id", "v", "seq")), contracts)
    val a = TxnGroup.read(spark, root, "a")
    assert(a.filter(col("id") === 99L).isEmpty, "junk leaked into publish")
    assert(a.count() == 2)
    assert(VersionedLake.history(spark, pa)
      .filter(col("operation") === "RESTORE").count() == 1)
  }

  test("create refuses unseeded members and duplicate groups") {
    import spark.implicits._
    val (root, pa, pb) = freshRoot()
    intercept[IllegalArgumentException] {
      TxnGroup.create(spark, root, Map("a" -> pa))
    }
    VersionedLake.upsert(spark, pa,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    TxnGroup.create(spark, root, Map("a" -> pa))
    intercept[IllegalArgumentException] {
      TxnGroup.create(spark, root, Map("a" -> pa))
    }
  }
}
