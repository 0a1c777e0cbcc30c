package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusStream

class CorpusStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming ingest equals the batch canonicalization") {
    val out = CorpusStream.corpusIngest(spark, sf)
      .orderBy(col("content_key")).collect()
    assert(out.nonEmpty)
    val norm = regexp_replace(lower(trim(col("text"))), " +", " ")
    val batch = Tables.documents(spark, sf)
      .withColumn("n_toks", size(split(norm, " ")).cast("long"))
      .filter(col("n_toks") >= CorpusStream.MinToks &&
        col("n_toks") <= CorpusStream.MaxToks)
      .withColumn("content_key", md5(norm))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"), min(col("n_toks")).as("n_toks"))
      .orderBy(col("content_key")).collect()
    assert(out.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    // the canonical state partitions the gated corpus: Σ n_copies ==
    // quality-passing doc count
    val gated = Tables.documents(spark, sf)
      .filter(size(split(norm, " ")).cast("long")
        .between(CorpusStream.MinToks, CorpusStream.MaxToks)).count()
    assert(out.map(_.getLong(2)).sum == gated)
  }
}
