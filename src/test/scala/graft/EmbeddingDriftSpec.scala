package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingDrift

class EmbeddingDriftSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("per-label rows, exact slice counts, non-negative drift") {
    val out = EmbeddingDrift.centroidDrift(emb).orderBy(col("label"))
    val rows = out.collect()
    val labels = emb.select(col("label")).distinct().count()
    assert(rows.length == labels)
    val counts = emb.groupBy(col("label"))
      .agg(count(when(pmod(col("vec_id"), lit(2L)) === 0, 1)).as("o"),
        count(when(pmod(col("vec_id"), lit(2L)) === 1, 1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (o, n) = counts(r.getInt(0))
      assert(r.getLong(1) == o && r.getLong(2) == n)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("identical slices drift exactly 0; partition-invariant") {
    // duplicate every vector into BOTH parities — centroids coincide,
    // so the integer-exact pipeline must produce drift == 0.0 (not
    // merely small): any float-summation leak would break this
    val dup = emb.select(
      explode(array(lit(0L), lit(1L))).as("p"),
      col("vec_id"), col("embedding"), col("label"))
      .select((col("vec_id") * 2 + col("p")).as("vec_id"),
        col("embedding"), col("label"))
    EmbeddingDrift.centroidDrift(dup).collect().foreach { r =>
      assert(r.getDouble(3) == 0.0, s"nonzero drift on identical slices: $r")
    }
    val a = EmbeddingDrift.centroidDrift(emb).orderBy(col("label")).collect()
    val b = EmbeddingDrift.centroidDrift(emb.repartition(7))
      .orderBy(col("label")).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
