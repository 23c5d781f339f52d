package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.col

/** The r14 SQL front door (DSv2): `spark.read.format("txlog")`, pushed
  * filters reaching the skip machinery (plan-lint: fewer dirs planned),
  * catalog CREATE/INSERT/SELECT, `VERSION AS OF` time travel, and the
  * SQL ≡ Scala path equivalence the gate hashes at full scale. */
class TxLogSqlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogScanTelemetry}

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogsql").toString + "/t"

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  /** Four dirs of 10 x-values each, adds carrying x envelopes AND a
    * partition value, schema recorded. */
  private def skipTable(): String = {
    val t = freshTable()
    val adds = (0 until 4).map { i =>
      val nm = s"d$i"
      (i * 10L until i * 10L + 10L).map(x => (x, x * 2)).toDF("x", "y")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm, TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("x")),
        part = Map("quartile" -> i.toString))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@adds")))
    t
  }

  test("format(\"txlog\"): reads the head via the registered short " +
      "name, schema from the log, results ≡ the Scala path") {
    val t = skipTable()
    val sql = spark.read.format("txlog").load(t)
    assert(sql.schema.fieldNames.toSeq == Seq("x", "y"))
    assert(sql.collect().map(_.getLong(0)).sorted.toSeq ==
      TxLog.read(spark, t, xySchema).collect().map(_.getLong(0))
        .sorted.toSeq)
  }

  test("pushed filter reaches pruneAdds: a BETWEEN plans 2 of 4 dirs, " +
      "an equality plans 1 of 4, an unfiltered read plans 4 of 4 — " +
      "results always ≡ the unpruned filter") {
    val t = skipTable()
    def run(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Seq[Long], (Int, Int)) = {
      TxLogScanTelemetry.lastPlanned = None
      val got = f(spark.read.format("txlog").load(t))
        .collect().map(_.getLong(0)).sorted.toSeq
      (got, TxLogScanTelemetry.lastPlanned.get)
    }
    val (all, pAll) = run(identity)
    assert(all.size == 40 && pAll == ((4, 4)))
    val (win, pWin) = run(_.filter(col("x") >= 12L && col("x") <= 25L))
    assert(win == (12L to 25L) && pWin == ((2, 4)),
      "the conjunct bounds must plan only the overlapping dirs")
    val (one, pOne) = run(_.filter(col("x") === 33L))
    assert(one == Seq(33L) && pOne == ((1, 4)))
    val (in, pIn) = run(_.filter(col("x").isin(5L, 7L)))
    assert(in == Seq(5L, 7L) && pIn == ((1, 4)),
      "IN prunes by the set's hull")
    // COUNT(*) (zero-column scan) still counts pruned-correctly
    val n = spark.read.format("txlog").load(t)
      .filter(col("x") < 10L).count()
    assert(n == 10L)
  }

  test("readStream.format(\"txlog\") follows a table through the same " +
      "short name: one commit per trigger, offsets = versions") {
    val t = skipTable() // 4 dirs in one commit
    val td = java.nio.file.Files.createTempDirectory("txlogsqlstream")
      .toString
    val q = spark.readStream.format("txlog")
      .schema(xySchema).option("path", t).load()
      .writeStream.option("checkpointLocation", s"$td/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$td/sink")
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$td/sink").count() == 40L,
      "the streamed follow must deliver every committed row")
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("metadata COUNT(*): an unfiltered count is answered from the " +
      "log (rows minus deletion-vector rows, zero data files opened); " +
      "filters and legacy adds fall back to the scan — never wrong") {
    import graft.sources.TxLogMerge
    import spark.implicits._
    val t = freshTable()
    TxLog.append((0L until 300L).map(x => (x, x)).toDF("x", "y"), t, "a")
    TxLog.append((300L until 400L).map(x => (x, x)).toDF("x", "y"), t, "b")
    assert(TxLog.countRows(spark, t).contains(400L))
    // a DV merge: delete 3, update 2 — counts subtract the vector
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((5L, 0L), (6L, 0L), (7L, 0L), (8L, 88L), (9L, 99L))
        .toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      deleteWhen = Some(col("x") <= 7L),
      nBuckets = 2, dvThreshold = 0.9) > 0L)
    assert(TxLog.countRows(spark, t).contains(397L),
      "sum(rows) - vector rows must equal the visible count")
    assert(TxLog.read(spark, t, xySchema).count() == 397L)
    // the SQL front door answers from metadata (schema from a commit)
    assert(TxLog.tryCommitActions(spark, t,
      TxLog.currentVersion(spark, t).get + 1, Nil, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@none")))
    graft.sources.TxLogScanTelemetry.lastCountStar = None
    assert(spark.read.format("txlog").load(t)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head().getLong(0) == 397L)
    assert(graft.sources.TxLogScanTelemetry.lastCountStar.contains(397L),
      "the unfiltered COUNT(*) must be metadata-served")
    // a WHERE blocks the pushdown (rows must be checked) — still exact
    graft.sources.TxLogScanTelemetry.lastCountStar = None
    assert(spark.read.format("txlog").load(t)
      .filter(col("x") < 100L).count() == 97L)
    assert(graft.sources.TxLogScanTelemetry.lastCountStar.isEmpty,
      "a filtered count must run the scan, not the metadata answer")
    // a legacy add (no recorded rows) disables the metadata path
    val t2 = freshTable()
    Seq((1L, 1L)).toDF("x", "y").coalesce(1).write.parquet(s"$t2/legacy")
    assert(TxLog.tryCommitActions(spark, t2, 0L,
      Seq(TxLog.AddFile("legacy")), Nil,
      schemaDdl = Some(xySchema.toDDL)))
    assert(TxLog.countRows(spark, t2).isEmpty)
    graft.sources.TxLogScanTelemetry.lastCountStar = None
    assert(spark.read.format("txlog").load(t2).count() == 1L)
    assert(graft.sources.TxLogScanTelemetry.lastCountStar.isEmpty,
      "legacy adds must fall back to the scan count")
  }

  test("versionAsOf option and SQL VERSION AS OF time-travel through " +
      "the catalog; CREATE TABLE records the schema; INSERT INTO " +
      "routes to the append verb") {
    val root = java.nio.file.Files.createTempDirectory("txlogcat").toString
    spark.conf.set("spark.sql.catalog.graftsql",
      "graft.sources.TxLogCatalog")
    spark.conf.set("spark.sql.catalog.graftsql.root", root)
    spark.sql("CREATE TABLE graftsql.t (x BIGINT, y BIGINT) USING txlog")
    assert(TxLog.currentVersion(spark, s"$root/t").contains(0L))
    assert(TxLog.logSchema(spark, s"$root/t").isDefined)
    spark.sql("INSERT INTO graftsql.t VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graftsql.t VALUES (3, 30)")
    assert(spark.sql("SELECT sum(x) FROM graftsql.t").head().getLong(0) == 6L)
    // time travel: v1 holds only the first insert
    assert(spark.sql("SELECT count(*) FROM graftsql.t VERSION AS OF 1")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM graftsql.t VERSION AS OF 0")
      .head().getLong(0) == 0L)
    // the option-based time travel agrees
    assert(spark.read.format("txlog").option("versionAsOf", "1")
      .load(s"$root/t").count() == 2L)
    // catalog hygiene: exists / list / drop
    assert(spark.sql("SHOW TABLES IN graftsql").collect()
      .map(_.getString(1)).contains("t"))
    // INSERT OVERWRITE is refused loudly — Spark blocks it at plan
    // time (the table declares no truncate capability)
    val e = intercept[Exception](
      spark.sql("INSERT OVERWRITE graftsql.t VALUES (9, 9)"))
    assert(e.getMessage.contains("does not support truncate") ||
      e.getMessage.contains("append-only"))
    spark.sql("DROP TABLE graftsql.t")
    assert(spark.sql("SHOW TABLES IN graftsql").collect()
      .map(_.getString(1)).forall(_ != "t"))
  }

  test("SQL catalog read prunes through the same skip machinery: a " +
      "WHERE bound over the catalog table plans fewer dirs") {
    val root = java.nio.file.Files.createTempDirectory("txlogcat2").toString
    spark.conf.set("spark.sql.catalog.graftsql2",
      "graft.sources.TxLogCatalog")
    spark.conf.set("spark.sql.catalog.graftsql2.root", root)
    // build the 4-dir skip table under the catalog root
    val t = s"$root/ev"
    val adds = (0 until 4).map { i =>
      val nm = s"d$i"
      (i * 10L until i * 10L + 10L).map(x => (x, x * 2)).toDF("x", "y")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm, TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("x")))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@adds")))
    TxLogScanTelemetry.lastPlanned = None
    val got = spark.sql(
      "SELECT sum(y) FROM graftsql2.ev WHERE x BETWEEN 12 AND 25")
      .head().getLong(0)
    assert(got == (12L to 25L).map(_ * 2).sum)
    assert(TxLogScanTelemetry.lastPlanned.contains((2, 4)),
      "the SQL WHERE must reach pruneAdds (2 of 4 dirs planned)")
  }
}
