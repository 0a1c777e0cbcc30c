package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fnv1a64
import graft.operators.Shards

class ShardsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  test("shards partition the corpus; manifest matches a driver replay") {
    val out = Shards.shuffleShards(docs).orderBy(col("shard_id")).collect()
    assert(out.map(_.getLong(0)).forall(s => s >= 0 && s < Shards.NumShards))
    assert(out.map(_.getLong(1)).sum == docs.count())
    assert(out.forall(_.getLong(2) > 0L), "a shard with zero tokens")
    // independent driver-side replay of the full contract: key, shard,
    // within-shard (key, doc_id) order, position fingerprint
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val keyed = ids.map { id =>
      (id, Fnv1a64.hashBytes(s"shuf:$id".getBytes("UTF-8")))
    }
    val expected = keyed
      .groupBy { case (_, k) => java.lang.Math.floorMod(k, Shards.NumShards.toLong) }
      .map { case (shard, members) =>
        val ordered = members.sortBy { case (id, k) => (k, id) }
        val fp = ordered.zipWithIndex.map { case ((id, _), i) =>
          ((i + 1).toLong * (id + 1)) % Shards.FpPrime
        }.sum % Shards.FpPrime
        shard -> (members.length.toLong, fp)
      }
    out.foreach { r =>
      val (nDocs, fp) = expected(r.getLong(0))
      assert(r.getLong(1) == nDocs, s"shard ${r.getLong(0)} doc count")
      assert(r.getLong(3) == fp, s"shard ${r.getLong(0)} order_fp")
    }
  }

  test("manifest is invariant to input partitioning") {
    val a = Shards.shuffleShards(docs).orderBy(col("shard_id")).collect()
    val b = Shards.shuffleShards(docs.repartition(7))
      .orderBy(col("shard_id")).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
