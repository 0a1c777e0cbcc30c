package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Masking
import graft.operators.Quality
import graft.sources.CsvIngest

class IngestQualitySpec extends AnyFunSuite {
  import TestSpark._

  test("csv ingest rescues malformed rows instead of dropping them") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "part-0.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,qty,name")
    w.println("1,10,alpha")
    w.println("2,notanumber,beta")
    w.println("3,30,gamma")
    w.close()

    val schema = new StructType()
      .add("id", IntegerType).add("qty", IntegerType).add("name", StringType)
    val df = CsvIngest.readCsv(spark, dir.getAbsolutePath, Some(schema)).cache()
    assert(df.count() == 3)
    val rescued = df.filter(col(CsvIngest.RescuedColumn).isNotNull)
    assert(rescued.count() == 1)
    assert(rescued.head().getAs[String]("name") == null ||
      rescued.head().getAs[String](CsvIngest.RescuedColumn).contains("notanumber"))
    assert(df.filter(col("_source_file").contains("part-0.csv")).count() == 3)
  }

  test("quality enforce drops violating rows and fail action throws") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, -5.0), (3, 7.0)).toDF("id", "v")
    val cleaned = Quality.enforce(df, Seq(
      Quality.Expectation("positive_v", col("v") >= 0)))
    assert(cleaned.count() == 2)
    intercept[Quality.ExpectationViolation] {
      Quality.enforce(df, Seq(
        Quality.Expectation("positive_v", col("v") >= 0, Quality.Action.Fail)))
        .count()
    }
  }

  test("quality metrics counts per rule in one pass") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, -5.0), (3, 7.0)).toDF("id", "v")
    val m = Quality.metrics(df, "t", Seq(
      Quality.Expectation("positive_v", col("v") >= 0),
      Quality.Expectation("id_small", col("id") <= 2))).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m("positive_v") == (2L, 1L))
    assert(m("id_small") == (2L, 1L))
  }

  test("masking matches the reference shapes") {
    import spark.implicits._
    val df = Seq(("Joao Silva", "joao.silva@gmail.com", "+55 (11) 91234-5678"))
      .toDF("n", "e", "p")
      .select(Masking.maskName(col("n")).as("n"),
        Masking.maskEmail(col("e")).as("e"),
        Masking.maskPhone(col("p")).as("p"))
    val r = df.head()
    assert(r.getString(0) == "J*** Silva")
    assert(r.getString(1) == "jo****@gmail.com")
    assert(r.getString(2) == "+55 (11) 9****-****")
  }

  test("pii-readers group sees unmasked data, region groups are filtered") {
    val sc = operators.Medallion.silverCustomers(
      Tables.customer(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf))
    val priv = Masking.maskedCustomers(sc, Set("pii-readers"))
    assert(priv.filter(col("customer_email").contains("****")).count() == 0)
    val regional = Masking.maskedCustomers(sc, Set("region-asia"))
    val regions = regional.select("region_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(regions == Set("ASIA"))
  }
}
