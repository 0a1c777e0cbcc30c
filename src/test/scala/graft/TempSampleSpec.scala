package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TempSample

class TempSampleSpec extends AnyFunSuite {
  import TestSpark._

  test("temperature flattening keeps the smallest source whole") {
    val rows = TempSample.temperatureSample(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val minN = rows.map(_._2).min
    rows.foreach { case (src, n, rate, kept) =>
      assert(kept <= n)
      assert(rate >= 0 && rate <= 1000000)
      if (n == minN)
        assert(rate == 1000000 && kept == n,
          s"smallest source $src not kept whole: rate=$rate kept=$kept/$n")
    }
    // rates monotonically non-increasing in source size
    rows.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a)
    }
    // flattening: kept shares are closer to uniform than raw shares —
    // the max/min ratio must shrink (guard >0: hash thresholding keeps
    // ≥1 doc per source at these rates)
    val keptMin = rows.map(_._4).min
    assert(keptMin > 0)
    val rawRatio = rows.map(_._2).max.toDouble / minN
    val keptRatio = rows.map(_._4).max.toDouble / keptMin
    if (rawRatio > 1.0) assert(keptRatio < rawRatio)
    else assert(rows.forall(_._3 == 1000000)) // uniform corpus: no-op
  }
}
