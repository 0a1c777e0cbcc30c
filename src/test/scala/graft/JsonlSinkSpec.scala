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
