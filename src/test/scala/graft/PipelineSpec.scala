package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Pipeline

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("topoSort orders dependencies before dependents and detects cycles") {
    val defs = Pipeline.medallion(sf)
    val order = Pipeline.topoSort(defs).map(_.name)
    assert(order.indexOf("silver_orders_enriched") <
      order.indexOf("gold_daily_orders"))
    assert(order.indexOf("silver_orders") <
      order.indexOf("silver_orders_enriched"))
    val cyclic = Seq(
      Pipeline.TableDef("a", "x", Seq("b"), (_, _) => null),
      Pipeline.TableDef("b", "x", Seq("a"), (_, _) => null))
    intercept[Pipeline.CycleException](Pipeline.topoSort(cyclic))
  }

  test("medallion pipeline materializes all layers to the lake dir") {
    val lake = Files.createTempDirectory("graft_pipeline").toString
    val out = Pipeline.run(spark, Pipeline.medallion(sf), Some(lake))
    assert(out.size == 10)
    val daily = spark.read.parquet(s"$lake/gold/gold_daily_orders")
    assert(daily.count() > 0)
    // landed gold equals the directly-built query
    val direct = SparkEntry.queries("gold_daily_orders")(spark, sf).count()
    assert(daily.count() == direct)
  }

  // a diamond DAG with an injectable failure:  a → (b, flaky) → d, plus
  // a fully independent branch e
  private def flakyDefs(failures: java.util.concurrent.atomic.AtomicInteger) = Seq(
    Pipeline.TableDef("a", "x", Nil, (s, _) => s.range(3).toDF("id")),
    Pipeline.TableDef("b", "x", Seq("a"), (_, t) => t("a")),
    Pipeline.TableDef("flaky", "x", Seq("a"), (s, t) => {
      if (failures.getAndDecrement() > 0) sys.error("injected build failure")
      t("a")
    }),
    Pipeline.TableDef("d", "x", Seq("b", "flaky"),
      (_, t) => t("b").union(t("flaky"))),
    Pipeline.TableDef("e", "y", Nil, (s, _) => s.range(5).toDF("id")))

  test("a table failing twice succeeds under maxRetries=2 and reports attempts") {
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val (out, report) = Pipeline.runWithReport(spark, flakyDefs(failures),
      policy = Pipeline.RunPolicy(maxRetries = 2))
    assert(out.size == 5)
    assert(out("d").count() == 6)
    val flaky = report.find(_.name == "flaky").get
    assert(flaky.status == "ok" && flaky.attempts == 3)
    assert(report.forall(_.status == "ok"))
  }

  test("continue-on-failure lands independent branches and skips downstream") {
    val failures = new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)
    val (out, report) = Pipeline.runWithReport(spark, flakyDefs(failures),
      policy = Pipeline.RunPolicy(maxRetries = 1, continueOnFailure = true))
    val status = report.map(r => r.name -> r.status).toMap
    assert(status("flaky") == "failed")
    assert(status("d") == "skipped") // downstream of the failure
    assert(status("a") == "ok" && status("b") == "ok" && status("e") == "ok")
    assert(report.find(_.name == "flaky").get.attempts == 2) // 1 + 1 retry
    assert(report.find(_.name == "d").get.error.exists(_.contains("flaky")))
    assert(out.keySet == Set("a", "b", "e")) // failed/skipped not returned
    assert(out("e").count() == 5)
    // default policy: the same failure makes run() throw
    val err = intercept[RuntimeException] {
      Pipeline.run(spark, flakyDefs(failures))
    }
    assert(err.getMessage.contains("flaky"))
  }

  test("event_log: a named run writes the ledger; the TVF serves it ordered") {
    import graft.plans.EventLog
    val failures = new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)
    EventLog.clear("spec_run")
    Pipeline.runWithReport(spark, flakyDefs(failures),
      policy = Pipeline.RunPolicy(maxRetries = 1, continueOnFailure = true,
        pipelineName = Some("spec_run")))
    EventLog.recordExpectations("spec_run", "a",
      Seq("ids_nonneg" -> 0L, "ids_present" -> 0L))
    val rows = spark.sql("SELECT * FROM event_log('spec_run')")
      .orderBy("seq").collect()
    val types = rows.map(_.getAs[String]("event_type")).toSeq
    assert(types == Seq("run_started") ++ Seq.fill(5)("flow_progress") ++
      Seq("run_completed", "expectation", "expectation"), types.toString)
    // flow rows land in TOPO order with the real statuses
    val flows = rows.filter(_.getAs[String]("event_type") == "flow_progress")
      .map(r => r.getAs[String]("table_name") -> r.getAs[String]("status"))
    assert(flows.toSeq == Seq("a" -> "ok", "b" -> "ok", "flaky" -> "failed",
      "d" -> "skipped", "e" -> "ok"), flows.mkString(","))
    assert(rows.last.getAs[String]("metric_name") == "ids_present")
    val completed = rows.find(
      _.getAs[String]("event_type") == "run_completed").get
    assert(completed.getAs[String]("message") ==
      "ok=3 failed=1 skipped=1 fresh=0", completed.toString)
    // the failed flow carries attempts and the error message
    val failed = rows.find(_.getAs[String]("status") == "failed").get
    assert(failed.getAs[Int]("attempts") == 2 &&
      failed.getAs[String]("message").contains("injected build failure"))
    // an unnamed run writes nothing; an unknown pipeline errors loudly
    Pipeline.runWithReport(spark, flakyDefs(
      new java.util.concurrent.atomic.AtomicInteger(0)))
    assert(EventLog.eventsFor("spec_run").size == rows.length)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM event_log('no_such_pipeline')").collect()
    }
    assert(e.getMessage.contains("no recorded events"), e.getMessage)
    // clear() scopes to its pipeline
    EventLog.record("spec_other", "run_started")
    EventLog.clear("spec_run")
    assert(EventLog.eventsFor("spec_run").isEmpty)
    assert(EventLog.eventsFor("spec_other").nonEmpty)
    EventLog.clear("spec_other")
  }

  test("per-table timeout: hung build times out, retries per policy, notifies once") {
    val notifications =
      new java.util.concurrent.ConcurrentLinkedQueue[Pipeline.NodeReport]()
    val defs = Seq(
      Pipeline.TableDef("good", "x", Nil, (s, _) => s.range(4).toDF("id")),
      Pipeline.TableDef("hung", "x", Nil, (s, _) => {
        Thread.sleep(120000) // a wedged source; interruptible
        s.range(1).toDF("id")
      }),
      Pipeline.TableDef("child", "x", Seq("hung"), (_, t) => t("hung")))
    val t0 = System.nanoTime()
    val (out, report) = Pipeline.runWithReport(spark, defs,
      policy = Pipeline.RunPolicy(maxRetries = 1, continueOnFailure = true,
        timeoutSeconds = Some(1L), retryOnTimeout = true,
        onFailure = r => { notifications.add(r); () }))
    val elapsed = (System.nanoTime() - t0) / 1e9
    val status = report.map(r => r.name -> r.status).toMap
    assert(status("good") == "ok")
    assert(status("hung") == "failed")
    assert(status("child") == "skipped")
    val hung = report.find(_.name == "hung").get
    assert(hung.attempts == 2, s"retry_on_timeout honored: $hung") // 1 + 1
    assert(hung.error.exists(_.contains("timed out")), hung.error)
    // two 1s budgets + backoff, never the 120s hang
    assert(elapsed < 60.0, s"timeout did not cut the hang: ${elapsed}s")
    // the notification hook fired exactly once, with the FINAL report
    assert(notifications.size == 1)
    assert(notifications.peek().name == "hung" &&
      notifications.peek().attempts == 2)
    assert(out.keySet == Set("good"))

    // retryOnTimeout=false: a timeout consumes NO retries — one attempt
    val n2 = new java.util.concurrent.ConcurrentLinkedQueue[Pipeline.NodeReport]()
    val (_, report2) = Pipeline.runWithReport(spark,
      defs.filter(_.name == "hung"),
      policy = Pipeline.RunPolicy(maxRetries = 3, continueOnFailure = true,
        timeoutSeconds = Some(1L), retryOnTimeout = false,
        onFailure = r => { n2.add(r); () }))
    assert(report2.head.attempts == 1 && report2.head.status == "failed")
    assert(n2.size == 1)
  }

  test("a failing notification hook never takes the DAG down") {
    val defs = Seq(
      Pipeline.TableDef("ok_table", "x", Nil, (s, _) => s.range(2).toDF("id")),
      Pipeline.TableDef("bad", "x", Nil,
        (_, _) => throw new RuntimeException("boom")))
    val (out, report) = Pipeline.runWithReport(spark, defs,
      policy = Pipeline.RunPolicy(continueOnFailure = true,
        onFailure = _ => throw new IllegalStateException("hook broke")))
    assert(report.map(r => r.name -> r.status).toMap ==
      Map("ok_table" -> "ok", "bad" -> "failed"))
    assert(out.keySet == Set("ok_table"))
  }

  test("incremental mode: unchanged run lands zero tables; a delta re-lands only its subtree") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_incr").toString
    val srcA = s"$work/src_a"; val srcB = s"$work/src_b"
    val lake = s"$work/lake"
    Seq(1L, 2L, 3L).toDF("id").write.parquet(srcA)
    Seq(10L, 20L).toDF("id").write.parquet(srcB)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // a ← srcA; b ← srcB; c ← a ⋈ b; d ← srcB  (two leaf sources, one
    // join table, one independent consumer of srcB)
    def defs = Seq(
      Pipeline.TableDef("a", "x", Nil,
        (s, _) => { builds.incrementAndGet(); s.read.parquet(srcA) },
        sources = Seq(srcA)),
      Pipeline.TableDef("b", "x", Nil,
        (s, _) => { builds.incrementAndGet(); s.read.parquet(srcB) },
        sources = Seq(srcB)),
      Pipeline.TableDef("c", "x", Seq("a", "b"),
        (_, t) => { builds.incrementAndGet(); t("a").union(t("b")) }),
      Pipeline.TableDef("d", "y", Nil,
        (s, _) => { builds.incrementAndGet(); s.read.parquet(srcB) },
        sources = Seq(srcB)))
    val incr = Pipeline.RunPolicy(mode = Pipeline.Incremental)
    // run 1: cold lake — everything builds
    val (_, r1) = Pipeline.runWithReport(spark, defs, Some(lake), incr)
    assert(r1.forall(_.status == "ok") && builds.get() == 4)
    // run 2: nothing changed — zero builds, all fresh, results served
    val (out2, r2) = Pipeline.runWithReport(spark, defs, Some(lake), incr)
    assert(r2.forall(_.status == "fresh"), r2.mkString(","))
    assert(builds.get() == 4, "a fresh run must not invoke any builder")
    assert(out2("c").count() == 5)
    // run 3: srcB gains a file — only b, c, d rebuild; a stays fresh
    Seq(30L).toDF("id").write.mode("append").parquet(srcB)
    val (out3, r3) = Pipeline.runWithReport(spark, defs, Some(lake), incr)
    val st = r3.map(r => r.name -> r.status).toMap
    assert(st == Map("a" -> "fresh", "b" -> "ok", "c" -> "ok", "d" -> "ok"), st.toString)
    assert(builds.get() == 7)
    assert(out3("c").count() == 6 && out3("d").count() == 3)
    // run 4: FullRefresh rebuilds everything regardless
    val (_, r4) = Pipeline.runWithReport(spark, defs, Some(lake),
      Pipeline.RunPolicy(mode = Pipeline.FullRefresh))
    assert(r4.forall(_.status == "ok") && builds.get() == 11)
  }

  test("incremental mode on the medallion DAG: second run is all fresh with equal counts") {
    val lake = Files.createTempDirectory("graft_incr_med").toString
    val incr = Pipeline.RunPolicy(mode = Pipeline.Incremental)
    val (out1, r1) = Pipeline.runWithReport(spark, Pipeline.medallion(sf),
      Some(lake), incr)
    assert(r1.forall(_.status == "ok"))
    val counts1 = out1.map { case (k, v) => k -> v.count() }
    val (out2, r2) = Pipeline.runWithReport(spark, Pipeline.medallion(sf),
      Some(lake), incr)
    assert(r2.forall(_.status == "fresh"), r2.mkString(","))
    val counts2 = out2.map { case (k, v) => k -> v.count() }
    assert(counts1 == counts2)
  }

  test("independent branches build concurrently (futures overlap)") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    def gauge(s: org.apache.spark.sql.SparkSession) = {
      val now = active.incrementAndGet()
      peak.accumulateAndGet(now, math.max)
      Thread.sleep(150) // hold the slot long enough to observe overlap
      active.decrementAndGet()
      s.range(1).toDF("id")
    }
    val defs = (1 to 4).map(i =>
      Pipeline.TableDef(s"t$i", "x", Nil, (s, _) => gauge(s)))
    Pipeline.run(spark, defs)
    assert(peak.get() >= 2, s"expected concurrent builds, peak=${peak.get()}")
  }
}
