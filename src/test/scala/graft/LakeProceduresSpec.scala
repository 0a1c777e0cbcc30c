package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** SQL stored procedures: discovery, argument handling, error paths,
  * and dry-run side-effect freedom at unit scale.
  */
class LakeProceduresSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshTable(tag: String): (String, String) = {
    val path = graft.sources.Scratch.dir(tag)
    val rows = (1L to 40L).map(k => (k, k * 1.5, s"p$k", k))
      .toDF("key_id", "value", "props", "sequence_number")
    VersionedLake.upsert(spark, path, rows, Seq("key_id"),
      "sequence_number")
    // a second MOR commit so there is a dead pre-image for vacuum
    VersionedLake.dvUpsert(spark, path,
      rows.filter(col("key_id") <= 10)
        .withColumn("value", col("value") * 2),
      Seq("key_id"), "sequence_number")
    SqlCatalog.install(spark)
    val t = s"${SqlCatalog.CatalogName}.lakehouse.proc_$tag"
    spark.sql(
      s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft LOCATION '$path'")
    (t, path)
  }

  test("SHOW PROCEDURES lists the system namespace") {
    SqlCatalog.install(spark)
    val df = spark.sql(
      s"SHOW PROCEDURES IN ${SqlCatalog.CatalogName}.system")
    val nameCol = df.columns.find(_.toLowerCase.contains("procedure"))
      .getOrElse(df.columns.last)
    val names = df.select(nameCol).collect().map(_.getString(0)).toSet
    assert(Set("optimize", "vacuum", "restore", "create_tag")
      .subsetOf(names), names.toString)
  }

  test("optimize binpack compacts and reports its own file counts") {
    val (t, path) = freshTable("optspec")
    val r = spark.sql(
      s"CALL ${SqlCatalog.CatalogName}.system.optimize('$t')").head()
    assert(r.getString(0) == "BINPACK")
    assert(r.getInt(4) <= r.getInt(3))
    assert(VersionedLake.history(spark, path).orderBy(col("version"))
      .collect().last.getString(1) == "OPTIMIZE")
  }

  test("vacuum dry_run plans but deletes nothing; real run deletes") {
    val (t, path) = freshTable("vacspec")
    spark.sql(s"CALL ${SqlCatalog.CatalogName}.system.optimize('$t')")
    val dry = spark.sql(s"CALL ${SqlCatalog.CatalogName}.system.vacuum(" +
      s"'$t', 1, dry_run => true)").collect().map(_.getString(1))
    assert(dry.nonEmpty, "expected a non-empty deletion plan")
    assert(dry.forall(f => new java.io.File(s"$path/$f").exists()),
      "dry run must not delete")
    val real = spark.sql(s"CALL ${SqlCatalog.CatalogName}.system.vacuum(" +
      s"'$t', 1, dry_run => false)").collect().map(_.getString(1))
    assert(real.sameElements(dry))
    assert(real.forall(f => !new java.io.File(s"$path/$f").exists()),
      "real vacuum must delete the planned files")
  }

  test("restore rolls content back as a new commit") {
    val (t, path) = freshTable("restspec")
    val beforeRows = spark.table(t).count()
    val v = VersionedLake.versions(spark, path).last
    VersionedLake.dvDelete(spark, path,
      Seq(1L, 2L).toDF("key_id"), Seq("key_id"))
    assert(spark.table(t).count() == beforeRows - 2)
    val r = spark.sql(
      s"CALL ${SqlCatalog.CatalogName}.system.restore('$t', $v)").head()
    assert(r.getString(1) == "RESTORE")
    assert(spark.table(t).count() == beforeRows)
  }

  test("create_tag at tip resolves through VERSION AS OF") {
    val (t, path) = freshTable("tagspec")
    val tip = VersionedLake.versions(spark, path).last
    val r = spark.sql(s"CALL ${SqlCatalog.CatalogName}.system" +
      s".create_tag('$t', 'audit')").head()
    assert(r.getString(0) == "audit" && r.getInt(1) == tip)
    val n = spark.sql(s"SELECT COUNT(*) FROM $t VERSION AS OF 'audit'")
      .head().getLong(0)
    assert(n == spark.table(t).count())
  }

  private def freshTxnPair(tag: String): (String, String, String, String) = {
    val ra = graft.sources.Scratch.dir(s"${tag}_a")
    val rb = graft.sources.Scratch.dir(s"${tag}_b")
    VersionedLake.upsert(spark, ra,
      Seq((1L, 1.0, 1L)).toDF("id", "v", "seq"), Seq("id"), "seq")
    VersionedLake.upsert(spark, rb,
      Seq((1L, 10.0, 1L)).toDF("id", "x", "seq"), Seq("id"), "seq")
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lakehouse")
    val (ta, tb) = (s"$cat.lakehouse.txp_${tag}_a", s"$cat.lakehouse.txp_${tag}_b")
    spark.sql(s"DROP TABLE IF EXISTS $ta")
    spark.sql(s"DROP TABLE IF EXISTS $tb")
    spark.sql(s"""CREATE TABLE $ta (id BIGINT, v DOUBLE, seq BIGINT)
      USING graft OPTIONS (mergeKeys 'id', mergeSeq 'seq') LOCATION '$ra'""")
    spark.sql(s"""CREATE TABLE $tb (id BIGINT, x DOUBLE, seq BIGINT)
      USING graft OPTIONS (mergeKeys 'id', mergeSeq 'seq') LOCATION '$rb'""")
    (ta, tb, ra, rb)
  }

  test("txn_create / txn_begin / txn_commit speak the TxnGroup lifecycle") {
    val (ta, tb, ra, _) = freshTxnPair("life")
    val cat = SqlCatalog.CatalogName
    val g = "spec" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    val created = spark.sql(s"CALL $cat.system.txn_create('$g', " +
      s"'a=lakehouse.txp_life_a,b=lakehouse.txp_life_b')").collect()
    assert(created.length == 2 && created.forall(_.getInt(2) == 1),
      created.mkString(","))
    // clean begin: nothing restored
    val b1 = spark.sql(s"CALL $cat.system.txn_begin('$g')").collect()
    assert(b1.length == 2 && b1.forall(!_.getBoolean(2)), b1.mkString(","))
    // DML on both members, then one commit publishes both
    spark.sql(s"INSERT INTO $ta VALUES (2, 2.0, 2)")
    spark.sql(s"INSERT INTO $tb VALUES (2, 20.0, 2)")
    val gp = graft.sources.LakeProcedures.txnGroupPath(g)
    assert(graft.sources.TxnGroup.read(spark, gp, "a").count() == 1,
      "uncommitted DML must stay invisible through the group")
    val c1 = spark.sql(s"CALL $cat.system.txn_commit('$g')").collect()
    assert(c1.length == 2 &&
      c1.forall(r => r.getInt(0) == 2 && r.getBoolean(3)), c1.mkString(","))
    assert(graft.sources.TxnGroup.read(spark, gp, "a").count() == 2)
    // crashed transaction: chain write with no commit → next begin
    // reports the restore and the chain is clean again
    spark.sql(s"INSERT INTO $ta VALUES (-9, -1.0, 9)")
    val b2 = spark.sql(s"CALL $cat.system.txn_begin('$g')").collect()
    assert(b2.exists(r => r.getString(0) == "a" && r.getBoolean(2)),
      b2.mkString(","))
    assert(spark.sql(s"SELECT * FROM $ta WHERE id = -9").isEmpty)
    assert(VersionedLake.history(spark, ra)
      .filter(col("operation") === "RESTORE").count() >= 1)
    // the transaction lifecycle is observable through event_log:
    // begin/commit rows under txn:<group>, the reclaim visible as a
    // 'restored' begin event
    val ev = spark.sql(s"SELECT * FROM event_log('txn:$g')")
      .orderBy("seq").collect()
    val types = ev.map(_.getAs[String]("event_type")).toSeq
    assert(types == Seq("txn_begin", "txn_begin", "txn_commit",
      "txn_commit", "txn_begin", "txn_begin"), types.toString)
    assert(ev.count(r => r.getAs[String]("event_type") == "txn_commit" &&
      r.getAs[String]("status") == "advanced") == 2, ev.mkString(","))
    assert(ev.exists(r => r.getAs[String]("table_name") == "a" &&
      r.getAs[String]("status") == "restored"), ev.mkString(","))
    graft.plans.EventLog.clear(s"txn:$g")
  }

  test("txn procedures refuse bad groups and bad member specs") {
    freshTxnPair("err")
    val cat = SqlCatalog.CatalogName
    intercept[Exception] { // path-shaped group name
      spark.sql(s"CALL $cat.system.txn_create('a/b', 'a=lakehouse.txp_err_a')")
    }
    intercept[Exception] { // unregistered member table
      spark.sql(s"CALL $cat.system.txn_create('gnope', 'a=lakehouse.nope')")
    }
    intercept[Exception] { // duplicate aliases
      spark.sql(s"CALL $cat.system.txn_create('gdup', " +
        "'a=lakehouse.txp_err_a,a=lakehouse.txp_err_b')")
    }
    intercept[Exception] { // begin of a group that was never created
      spark.sql(s"CALL $cat.system.txn_begin('gmissing')")
    }
  }

  test("bad modes, unknown procedures and unknown tables are refused") {
    val (t, _) = freshTable("errspec")
    val cat = SqlCatalog.CatalogName
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.optimize('$t', 'shuffle')")
    }
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.optimize('$t', 'cluster')") // no column
    }
    intercept[Exception] { spark.sql(s"CALL $cat.system.frobnicate('$t')") }
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.optimize('lakehouse.nope')")
    }
  }
}
