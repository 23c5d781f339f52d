package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType

/** RESTORE + rich DESCRIBE HISTORY (r15): a restore commit makes the
  * head equal an older snapshot with history preserved; history
  * classifies every commit from its action shape. */
class TxLogRestoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.TxLog

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogrestore").toString + "/t"

  private def commitRange(t: String, v: Long, lo: Long, hi: Long): Unit = {
    (lo until hi).map(x => (x, x * 2)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/d$v")
    assert(TxLog.tryCommitActions(spark, t, v, Seq(TxLog.AddFile(s"d$v")),
      Nil, schemaDdl = if (v == 0) Some(xySchema.toDDL) else None,
      cdf = Some("@adds")))
  }

  private def xs(t: String, asOf: Option[Long] = None): Seq[Long] =
    TxLog.read(spark, t, xySchema, asOf).collect()
      .map(_.getLong(0)).sorted.toSeq

  test("restore to an older version: the head equals that snapshot, " +
      "the rolled-back versions STAY readable, appends continue, and " +
      "the restore is classified RESTORE in history") {
    val t = freshTable()
    (0 to 2).foreach(v => commitRange(t, v, v * 10L, v * 10L + 10L))
    val v = TxLog.restore(spark, t, 1L)
    assert(v == 3L, "the restore is a NEW commit, not a rewrite")
    assert(xs(t) == (0L until 20L), "head ≡ the v1 snapshot")
    assert(xs(t, Some(2L)) == (0L until 30L),
      "the rolled-back v2 still time-travels — history preserved")
    assert(xs(t, Some(1L)) == (0L until 20L))
    commitRange(t, 4L, 100L, 105L)
    assert(xs(t) == ((0L until 20L) ++ (100L until 105L)),
      "appends continue on the restored head")
    val h = TxLog.history(spark, t)
    assert(h.head.version == 4L && h.head.operation == "APPEND")
    assert(h(1).version == 3L && h(1).operation == "RESTORE" &&
      h(1).nRemoves == 1, s"got ${h(1)}")
  }

  test("restore to the head (or an identical live set) is a no-op " +
      "that commits nothing; restore past the head is loud") {
    val t = freshTable()
    (0 to 1).foreach(v => commitRange(t, v, v * 10L, v * 10L + 10L))
    assert(TxLog.restore(spark, t, 1L) == 1L)
    assert(TxLog.currentVersion(spark, t).contains(1L), "no new commit")
    val e = intercept[IllegalArgumentException] {
      TxLog.restore(spark, t, 9L)
    }
    assert(e.getMessage.contains("head is v1"))
  }

  test("restore to a snapshot vacuum physically deleted is LOUD — " +
      "never a half-table") {
    val t = freshTable()
    writeThree(t)
    // retain 1 → v0's exclusive dir "a" is physically deleted
    assert(TxLog.vacuum(spark, t, retainVersions = 1) == Seq("a"))
    val e = intercept[IllegalArgumentException] {
      TxLog.restore(spark, t, 0L)
    }
    assert(e.getMessage.contains("vacuum has physically deleted"),
      s"got ${e.getMessage}")
  }

  private def writeThree(t: String): Unit = {
    def w(name: String, v: Long): Unit =
      Seq((v, v)).toDF("x", "y").coalesce(1).write.parquet(s"$t/$name")
    w("a", 1L); w("b", 2L); w("c", 3L)
    assert(TxLog.tryCommit(spark, t, 0L, Seq("a"), Nil))
    assert(TxLog.tryCommit(spark, t, 1L, Seq("b"), Seq("a")))
    assert(TxLog.tryCommit(spark, t, 2L, Seq("c"), Nil))
  }

  test("history classifies every verb from its action shape: CREATE, " +
      "APPEND, STREAMING_APPEND, OPTIMIZE, DELETE, RESTORE — newest " +
      "first, rows_added only when every add recorded rows") {
    val t = freshTable()
    // v0 CREATE (schema-only), v1 APPEND, v2 STREAMING_APPEND,
    // v3 OPTIMIZE, v4 DELETE, v5 RESTORE (to v2)
    assert(TxLog.tryCommitActions(spark, t, 0L, Nil, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@adds")))
    TxLog.append((0L until 7L).map(x => (x, x)).toDF("x", "y"), t, "d1")
    TxLog.commitBatch(
      (10L until 15L).map(x => (x, x)).toDF("x", "y"), t, 0L)
    val opt = TxLog.optimize(spark, t, Some(xySchema))
    assert(opt.contains(3L))
    val live = TxLog.liveFiles(spark, t)
    assert(TxLog.tryCommitActions(spark, t, 4L, Nil,
      live, cdf = None)) // DELETE everything
    assert(TxLog.restore(spark, t, 2L) == 5L)
    assert(xs(t) == ((0L until 7L) ++ (10L until 15L)).sorted)
    val ops = TxLog.history(spark, t).map(h => h.version -> h.operation)
    assert(ops == Seq(5L -> "RESTORE", 4L -> "DELETE", 3L -> "OPTIMIZE",
      2L -> "STREAMING_APPEND", 1L -> "APPEND", 0L -> "CREATE"),
      s"got $ops")
    val h = TxLog.history(spark, t)
    assert(h.find(_.version == 1L).get.rowsAdded.contains(7L))
    assert(h.find(_.version == 2L).get.rowsAdded.contains(5L))
    assert(h.find(_.version == 2L).get.appIds == Seq("stream"))
  }

  test("restore composes with the restore'd dirs' recorded metadata: " +
      "stats envelopes still prune after a restore") {
    val t = freshTable()
    def addWithStats(v: Long, lo: Long, hi: Long): Unit = {
      val nm = s"d$v"
      (lo until hi).map(x => (x, x)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/$nm")
      assert(TxLog.tryCommitActions(spark, t, v, Seq(TxLog.AddFile(nm,
        TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("x")))), Nil,
        schemaDdl = if (v == 0) Some(xySchema.toDDL) else None,
        cdf = Some("@adds")))
    }
    addWithStats(0L, 0L, 10L)
    addWithStats(1L, 10L, 20L)
    // v2: delete d0, v3: restore to v1 (re-adds d0 with its stats)
    assert(TxLog.tryCommitActions(spark, t, 2L, Nil, Seq("d0"),
      cdf = None))
    assert(TxLog.restore(spark, t, 1L) == 3L)
    val restored = TxLog.liveAdds(spark, t).find(_.name == "d0").get
    assert(restored.stats.contains("x"),
      "the re-add must carry the original stats envelope")
  }
}
