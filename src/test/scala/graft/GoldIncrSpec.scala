package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GoldIncr

class GoldIncrSpec extends AnyFunSuite {
  import TestSpark._

  /** (relative file, size, mtime) of every data file under `root`. */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    val r = Paths.get(root)
    val walk = Files.walk(r)
    try walk.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith("_"))
      .map((p: Path) => r.relativize(p).toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally walk.close()
  }

  test("incremental refresh rewrites ONLY the touched month partitions") {
    val path = Files.createTempDirectory("graft_gold_incr").toString
    val orders = Tables.orders(spark, sf)
    val recent = GoldIncr.initialLand(orders, path)
    assert(recent.size == 2)
    val before = snapshot(path)
    assert(before.nonEmpty)
    Thread.sleep(20) // mtime granularity guard
    val refreshed = GoldIncr.incrRefresh(orders, path)
    val after = snapshot(path)
    val touched = (f: String) => recent.exists(m => f.contains(s"month_str=$m"))
    // untouched month partitions: byte-identical files, none rewritten
    val untouchedBefore = before.filterNot { case (f, _) => touched(f) }
    val untouchedAfter = after.filterNot { case (f, _) => touched(f) }
    assert(untouchedBefore == untouchedAfter,
      "an untouched partition's files changed")
    // the touched months DID rewrite
    assert(after.keys.exists(touched), "no touched partition present")
    assert(before.filter { case (f, _) => touched(f) } !=
      after.filter { case (f, _) => touched(f) },
      "touched partitions were not rewritten")
    // and the refreshed table equals the full recompute
    val full = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("revenue"))
    assert(refreshed.orderBy("day").collect().toSeq ==
      full.orderBy("day").collect().toSeq)
  }
}
