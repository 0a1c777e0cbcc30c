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

  test("two real threads racing the group CAS: win/rebase observed, no lost publish") {
    import spark.implicits._
    val (root, pa, pb) = freshRoot()
    VersionedLake.upsert(spark, pa,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, pb,
      Seq((1L, 10.0, 1L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    TxnGroup.create(spark, root, Map("a" -> pa, "b" -> pb))
    val contracts = Map("a" -> (Seq("id"), "seq"), "b" -> (Seq("id"), "seq"))
    // DISJOINT tables: thread 1 writes only a, thread 2 only b — the
    // CAS loser must REBASE (carry the winner's entry) and still land
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def attempt(writes: Map[String, org.apache.spark.sql.DataFrame]) =
      pool.submit(new java.util.concurrent.Callable[TxnGroup.GroupCommitResult] {
        def call(): TxnGroup.GroupCommitResult = {
          gate.await(10, TimeUnit.SECONDS)
          TxnGroup.commit(spark, root, writes, contracts)
        }
      })
    val f1 = attempt(Map("a" -> Seq((2L, "a2", 2L)).toDF("id", "v", "seq")))
    val f2 = attempt(Map("b" -> Seq((2L, 20.0, 2L)).toDF("id", "x", "seq")))
    gate.countDown()
    val (r1, r2) = (f1.get(120, TimeUnit.SECONDS), f2.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // both landed, in distinct group versions — no lost publish
    assert(Set(r1.groupVersion, r2.groupVersion) == Set(2, 3),
      s"expected group v2+v3, got $r1 / $r2")
    val (tipV, pub) = TxnGroup.tip(spark, root)
    assert(tipV == 3)
    // the final published state carries BOTH writes
    assert(TxnGroup.read(spark, root, "a").count() == 2)
    assert(TxnGroup.read(spark, root, "b").count() == 2)
    // and the v3 map carries v2's entry forward (the rebase is visible
    // structurally: both members advanced beyond their create version)
    assert(pub("a") > 1 && pub("b") > 1, pub.toString)
  }

  test("crash mid-commit: chain landed, CAS never happened — next begin reclaims BOTH members") {
    import spark.implicits._
    val (root, pa, pb) = freshRoot()
    VersionedLake.upsert(spark, pa,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, pb,
      Seq((1L, 10.0, 1L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    TxnGroup.create(spark, root, Map("a" -> pa, "b" -> pb))
    // simulate the crash window of commit(): member writes landed on
    // BOTH chains, process died before the group CAS
    VersionedLake.upsert(spark, pa,
      Seq((7L, "junk", 7L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, pb,
      Seq((7L, 70.0, 7L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    // group readers never saw it
    assert(TxnGroup.read(spark, root, "a").count() == 1)
    assert(TxnGroup.read(spark, root, "b").count() == 1)
    // the next begin restores BOTH chains to their published versions
    val b = TxnGroup.begin(spark, root)
    assert(b.forall(_._3), s"both members were dirty, got $b")
    assert(VersionedLake.read(spark, pa).filter(col("id") === 7L).isEmpty)
    assert(VersionedLake.read(spark, pb).filter(col("id") === 7L).isEmpty)
    // and the REPLAYED transaction publishes cleanly
    val contracts = Map("a" -> (Seq("id"), "seq"), "b" -> (Seq("id"), "seq"))
    TxnGroup.commit(spark, root, Map(
      "a" -> Seq((2L, "a2", 2L)).toDF("id", "v", "seq"),
      "b" -> Seq((2L, 20.0, 2L)).toDF("id", "x", "seq")), contracts)
    val a = TxnGroup.read(spark, root, "a").orderBy("id")
      .collect().map(_.getString(1)).toSeq
    assert(a == Seq("a1", "a2"), s"published content wrong: $a")
    assert(TxnGroup.read(spark, root, "b").count() == 2)
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

  test("gate compared output is all-BIGINT cents + flags (r13 task 1)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType}
    val sf = TestSpark.sf
    val full = TxnGroup.queries("lake_multi_txn")(spark, sf)
      .localCheckpoint(true)
    // the compared schema carries NO decimal/double column — the r13
    // bisect proved the driver's type-tagged hash diverges on this
    // gate's DECIMAL(18,2) serialization while the integer-cents
    // domain (diag_fp) matched exactly; cents-BIGINT is the contract
    val types = full.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("o_orderkey") == LongType)
    assert(types("o_totalprice_cents") == LongType)
    assert(types("line_count") == LongType)
    assert(types("sum_qty_cents") == LongType)
    assert(types("fp_col") == StringType && types("fp") == LongType)
    assert(types.values.forall(t =>
      t == LongType || t == StringType || t == BooleanType))
    // four fingerprint rows, one per tracked column, keyed negatively
    val fp = full.filter(col("fp_col").isNotNull)
    assert(fp.count() == 4)
    assert(fp.filter(col("o_orderkey") >= 0).isEmpty)
    assert(fp.select("fp_col").collect().map(_.getString(0)).sorted.toSeq
      == Seq("line_count", "o_orderkey", "o_totalprice_cents",
        "sum_qty_cents"))
    // cents are real money: data rows are strictly positive pennies
    val data = full.filter(col("fp_col").isNull)
    assert(data.filter(col("o_totalprice_cents") <= 0).isEmpty)
    assert(data.filter(col("sum_qty_cents") <= 0).isEmpty)
    assert(data.count() > 0)
    // the +1.00 touch-up lands deterministically: the four fingerprint
    // rows are bit-stable across two independent runs of the same slice
    val fp2 = TxnGroup.queries("lake_multi_txn")(spark, sf)
      .filter(col("fp_col").isNotNull)
      .select("fp_col", "fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fp1 = fp.select("fp_col", "fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp1 == fp2)
  }
}
