package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JsonlSink, Scratch}

class JsonlSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("commit manifest matches disk and the data round-trips") {
    import spark.implicits._
    val out = Scratch.dir("jsonl_spec_ok")
    val df = (1L to 1000L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "v").repartition(4)
    df.write.format("graft.sources.JsonlSink").mode("append").save(out)
    val manifested = JsonlSink.committedFiles(out).map(new File(_).getName)
    val onDisk = new File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".jsonl")).toSeq
    assert(manifested.nonEmpty)
    assert(manifested.sorted == onDisk.sorted,
      s"manifest $manifested != disk $onDisk")
    assert(onDisk.forall(_.startsWith("part-"))) // no stray temp files
    val back = spark.read.schema(df.schema)
      .json(JsonlSink.committedFiles(out): _*)
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).head.getLong(0) == 1000L * 1001 / 2)
    // exact double round-trip through the shortest-repr serialization
    assert(back.agg(sum($"v".cast("decimal(18,4)"))).head.getDecimal(0)
      == df.agg(sum($"v".cast("decimal(18,4)"))).head.getDecimal(0))
  }

  test("append accumulates: second write keeps the first commit's rows") {
    import spark.implicits._
    val out = Scratch.dir("jsonl_spec_append")
    val a = (1L to 100L).toDF("id").repartition(2)
    val b = (101L to 250L).toDF("id").repartition(3)
    a.write.format("graft.sources.JsonlSink").mode("append").save(out)
    val afterFirst = JsonlSink.committedFiles(out)
    b.write.format("graft.sources.JsonlSink").mode("append").save(out)
    val afterSecond = JsonlSink.committedFiles(out)
    // every file of commit 1 survives commit 2 untouched, by name
    assert(afterFirst.toSet.subsetOf(afterSecond.toSet),
      s"first commit's files dropped: ${afterFirst.diff(afterSecond)}")
    assert(afterSecond.size == afterFirst.size + 3)
    val back = spark.read.schema(a.schema).json(afterSecond: _*)
    assert(back.count() == 250)
    assert(back.agg(sum($"id")).head.getLong(0) == 250L * 251 / 2)
  }

  test("non-finite doubles serialize as null (valid RFC 8259)") {
    import spark.implicits._
    val out = Scratch.dir("jsonl_spec_nonfinite")
    val df = Seq((1L, 1.5), (2L, Double.NaN),
      (3L, Double.PositiveInfinity), (4L, Double.NegativeInfinity))
      .toDF("id", "v").coalesce(1)
    df.write.format("graft.sources.JsonlSink").mode("append").save(out)
    val back = spark.read.schema(df.schema)
      .json(JsonlSink.committedFiles(out): _*)
    assert(back.count() == 4) // no corrupt rows: every line parsed
    assert(back.filter($"v".isNull).select($"id").as[Long].collect()
      .sorted.toSeq == Seq(2L, 3L, 4L))
    assert(back.filter($"id" === 1L).select($"v").as[Double].head() == 1.5)
  }

  test("a failing task aborts the whole write: nothing becomes visible") {
    import spark.implicits._
    val out = Scratch.dir("jsonl_spec_abort")
    val df = (1L to 100L).toDF("id").repartition(4)
      // poison one row: assert_true throws inside the scan of one task
      .withColumn("id", when(col("id") === 42L,
        assert_true(lit(false)).cast("long")).otherwise(col("id")))
    intercept[Exception] {
      df.write.format("graft.sources.JsonlSink").mode("append").save(out)
    }
    assert(JsonlSink.committedFiles(out).isEmpty, "manifest appeared")
    val visible = Option(new File(out).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("part-"))
    assert(visible.isEmpty, s"files visible after abort: ${visible.toSeq}")
  }
}
