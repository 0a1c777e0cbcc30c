package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, CdcSnapshot}

/** AUTO CDC FROM SNAPSHOT: the synthesized feed must carry ONLY real
  * changes (unchanged rows in the next snapshot produce no event), and
  * the SCD2 result must close ranges on absence and re-open on
  * reappearance — the snapshot-mode contracts feed CDC cannot express.
  */
class CdcSnapshotSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val out =
    CdcSnapshot.queries("cdc_from_snapshot")(spark, sf).collect()

  test("validity bounds live in snapshot-version units (1..4)") {
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val s = r.getAs[Long]("__start_at")
      s >= 1L && s <= 4L
    })
    assert(out.forall { r =>
      r.isNullAt(r.fieldIndex("__end_at")) ||
        r.getAs[Long]("__end_at") > r.getAs[Long]("__start_at")
    })
  }

  test("current rows = keys live in the FINAL snapshot (SCD1 at max)") {
    val current = out.filter(_.getAs[Boolean]("__is_current"))
      .map(r => r.getAs[Long]("key_id") -> r.getAs[Double]("value")).toMap
    val finalSnap = Cdc.scd1Current(Tables.events(spark, sf))
      .select(col("key_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(current == finalSnap)
  }

  test("per key at most one open range; ranges never overlap") {
    val byKey = out.groupBy(_.getAs[Long]("key_id"))
    byKey.foreach { case (k, rows) =>
      assert(rows.count(_.getAs[Boolean]("__is_current")) <= 1,
        s"key $k has multiple open ranges")
      val sorted = rows.sortBy(_.getAs[Long]("__start_at"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(a.fieldIndex("__end_at")) &&
            a.getAs[Long]("__end_at") <= b.getAs[Long]("__start_at"),
            s"key $k has overlapping ranges")
        case _ => ()
      }
    }
  }
}
