package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  import TestSpark._

  test("trained LDA separates the weak classes (train accuracy > 0.8)") {
    val out = QualityClassifier.classify(Tables.documents(spark, sf)).cache()
    try {
      val n = out.count()
      assert(n > 0)
      val agree = out.filter(col("predicted") === col("label")).count()
      // a linear model fit ON these labels' own features must fit them
      assert(agree.toDouble / n > 0.8, s"train accuracy ${agree.toDouble / n}")
      // both predicted classes actually occur — the model is not a
      // constant (a degenerate fit would still "agree" if one class
      // dominates)
      assert(out.select("predicted").distinct().count() == 2)
    } finally out.unpersist()
  }

  test("scores are partitioning-invariant (exact sufficient statistics)") {
    val docs = Tables.documents(spark, sf)
    val a = QualityClassifier.classify(docs)
    val b = QualityClassifier.classify(docs.repartition(7, col("doc_id")))
    // bit-exact: integer sums are order-independent and the double
    // derivation tree is fixed, so any partitioning gives THE model
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("filter stats are consistent with per-doc predictions") {
    val docs = Tables.documents(spark, sf)
    val perDoc = QualityClassifier.classify(docs)
      .agg(sum("predicted")).collect()(0).getLong(0)
    val stats = QualityClassifier.filterStats(docs)
    val kept = stats.agg(sum("n_kept")).collect()(0).getLong(0)
    assert(kept == perDoc)
    val bad = stats.filter(col("keep_rate") < 0.0 || col("keep_rate") > 1.0)
    assert(bad.isEmpty)
  }
}
