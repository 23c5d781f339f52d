package graft

import org.scalatest.funsuite.AnyFunSuite

/** `CALL <cat>.system.<proc>(…)` (r15) — the maintenance verbs as DSv2
  * stored procedures. */
class TxLogProcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCat(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("txlogproc")
      .toString
    val cat = s"graftproc_${math.abs(root.hashCode).toString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def build(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.t (x BIGINT, y BIGINT) USING txlog")
    Seq.tabulate(10)(i => (i.toLong, i.toLong)).toDF("x", "y")
      .createOrReplaceTempView("proc_v1")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM proc_v1")
    Seq.tabulate(5)(i => (100L + i, 0L)).toDF("x", "y")
      .createOrReplaceTempView("proc_v2")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM proc_v2")
  }

  test("CALL optimize compacts (returns the committed version), CALL " +
      "restore rolls back to it durably, CALL history classifies the " +
      "whole walk — all pure SQL") {
    val (cat, _) = freshCat()
    build(cat)
    val ov = spark.sql(s"CALL $cat.system.optimize('t')")
      .collect().map(_.getLong(0)).toSeq
    assert(ov == Seq(3L), s"optimize must commit v3, got $ov")
    val rv = spark.sql(s"CALL $cat.system.restore('t', 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rv == Seq((2L, 4L)), "restore to v2 commits v4")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 15L)
    val ops = spark.sql(s"CALL $cat.system.history('t')")
      .select("version", "operation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ops == Seq(4L -> "RESTORE", 3L -> "OPTIMIZE", 2L -> "APPEND",
      1L -> "APPEND", 0L -> "CREATE"), s"got $ops")
  }

  test("CALL zorder clusters, write_manifest materializes the head's " +
      "manifest, vacuum_derived reclaims the stale one") {
    val (cat, root) = freshCat()
    build(cat)
    val zv = spark.sql(s"CALL $cat.system.zorder('t', 'x,y', 2)")
      .collect().map(_.getLong(0)).toSeq
    assert(zv == Seq(3L), s"zorder must commit v3, got $zv")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 15L)
    val m1 = spark.sql(s"CALL $cat.system.write_manifest('t')")
      .head().getLong(0)
    assert(m1 == 3L, "the manifest names the manifested head")
    Seq((200L, 1L)).toDF("x", "y").createOrReplaceTempView("proc_v3")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM proc_v3")
    assert(spark.sql(s"CALL $cat.system.write_manifest('t')")
      .head().getLong(0) == 4L)
    val gone = spark.sql(s"CALL $cat.system.vacuum_derived('t', 16)")
      .collect().map(_.getString(0)).toSeq
    assert(gone.exists(_.contains("_manifest/v0000000003")),
      s"the stale v3 manifest must be reclaimed, got $gone")
  }

  test("CALL vacuum deletes superseded dirs; vacuum_older_than " +
      "dry-run reports and changes nothing; checkpoint returns the " +
      "head; unknown procedures are loud with the available names") {
    val (cat, _) = freshCat()
    build(cat)
    spark.sql(s"CALL $cat.system.optimize('t')").collect()
    val dry = spark.sql(
      s"CALL $cat.system.vacuum_older_than('t', ${Long.MaxValue}, true)")
      .collect().head
    assert(dry.getBoolean(3) && dry.getInt(1) == 2,
      s"dry run must report both superseded ins-dirs, got $dry")
    val deleted = spark.sql(s"CALL $cat.system.vacuum('t', 0)")
      .collect().map(_.getString(0)).toSeq
    assert(deleted.size == 2 && deleted.forall(_.startsWith("ins-")),
      s"vacuum at the head deletes the two compacted-away dirs: $deleted")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 15L, "live data untouched")
    val ck = spark.sql(s"CALL $cat.system.checkpoint('t')")
      .collect().map(_.getLong(0)).toSeq
    assert(ck == Seq(3L), "checkpoint at the optimize head")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope('t')").collect()
    }
    assert(e.getMessage.contains("available") ||
      Option(e.getCause).exists(_.getMessage.contains("available")),
      s"got $e")
  }
}
