package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** sources.TxLog — the log-structured ACID table format: commit
  * visibility and time travel on a crafted table, the two-writer
  * optimistic-concurrency race (exactly one commit wins — lost update
  * impossible), and the loud corruption paths (log gap, remove of an
  * unknown file, travel past the head). */
class TxLogSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.TxLog

  private val schema = StructType(Seq(StructField("x", LongType)))

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog").toString + "/t"

  private def writeVals(table: String, name: String, vals: Long*): Unit =
    vals.toDF("x").coalesce(1).write.parquet(s"$table/$name")

  private def readVals(table: String, asOf: Option[Long]): Set[Long] =
    TxLog.read(spark, table, schema, asOf).collect().map(_.getLong(0)).toSet

  test("commit visibility + time travel: every version stays readable " +
      "after later commits remove its files") {
    val t = freshTable()
    writeVals(t, "a", 1L, 2L)
    writeVals(t, "b", 3L)
    writeVals(t, "c", 4L)
    assert(TxLog.currentVersion(spark, t).isEmpty)
    assert(TxLog.tryCommit(spark, t, 0L, Seq("a"), Nil))
    assert(TxLog.tryCommit(spark, t, 1L, Seq("b"), Nil))
    assert(TxLog.tryCommit(spark, t, 2L, Seq("c"), Seq("a")))
    assert(TxLog.currentVersion(spark, t).contains(2L))
    assert(readVals(t, Some(0L)) == Set(1L, 2L))
    assert(readVals(t, Some(1L)) == Set(1L, 2L, 3L))
    assert(readVals(t, Some(2L)) == Set(3L, 4L))
    assert(readVals(t, None) == Set(3L, 4L))
    // an empty snapshot (everything removed) reads as an empty frame
    assert(TxLog.tryCommit(spark, t, 3L, Nil, Seq("b", "c")))
    assert(readVals(t, None) == Set.empty[Long])
  }

  test("optimistic concurrency: two writers racing the same version — " +
      "exactly one wins, on every round") {
    val t = freshTable()
    writeVals(t, "base", 0L)
    assert(TxLog.tryCommit(spark, t, 0L, Seq("base"), Nil))
    (1L to 20L).foreach { v =>
      writeVals(t, s"w1-$v", v * 10)
      writeVals(t, s"w2-$v", v * 10 + 1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val gate = new java.util.concurrent.CountDownLatch(1)
        def racer(name: String) = pool.submit(
          new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              gate.await()
              TxLog.tryCommit(spark, t, v, Seq(name), Nil)
            }
          })
        val (f1, f2) = (racer(s"w1-$v"), racer(s"w2-$v"))
        gate.countDown()
        val wins = Seq(f1.get(), f2.get()).count(identity)
        assert(wins == 1, s"round $v: $wins winners (must be exactly 1)")
      } finally pool.shutdown()
    }
    // the log is contiguous and every committed version reads cleanly
    assert(TxLog.currentVersion(spark, t).contains(20L))
    assert(readVals(t, None).size == 21)
  }

  test("exactly-once stream sink: a full checkpoint-recovery replay " +
      "(fresh checkpoint, batch ids restart at 0) re-delivers every " +
      "batch and changes nothing") {
    val base = java.nio.file.Files.createTempDirectory("txsink").toString
    val tbl = s"$base/table"
    val feed = graft.streaming.StreamGate.writeOrderedChunks(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "ts"),
      "ts", chunks = 3, prefix = "txsink-feed")
    def runOnce(ck: String): Unit = {
      val q = spark.readStream.schema("id LONG, ts LONG")
        .option("maxFilesPerTrigger", 1).parquet(feed)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          TxLog.commitBatch(b, tbl, id)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(s"$base/ck1")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType)))
    def contents() = TxLog.read(spark, tbl, schema, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(contents() == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(TxLog.currentVersion(spark, tbl).contains(2L))
    // the "recovery": a FRESH checkpoint replays batches 0..2 from scratch
    runOnce(s"$base/ck2")
    assert(contents() == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      "replayed batches must be no-ops, not duplicates")
    assert(TxLog.currentVersion(spark, tbl).contains(2L))
  }

  test("vacuum deletes only files dead at every retained version; reads " +
      "past the horizon fail loudly; retained time travel still works") {
    val t = freshTable()
    writeVals(t, "a", 1L)
    writeVals(t, "b", 2L)
    writeVals(t, "c", 3L)
    assert(TxLog.tryCommit(spark, t, 0L, Seq("a"), Nil))
    assert(TxLog.tryCommit(spark, t, 1L, Seq("b"), Seq("a")))
    assert(TxLog.tryCommit(spark, t, 2L, Seq("c"), Nil))
    assert(TxLog.history(spark, t).map(h =>
      (h.version, h.nAdds, h.nRemoves)) ==
      Seq((2L, 1, 0), (1L, 1, 1), (0L, 1, 0)), "newest first")
    // retain 1 → horizon = v1: "a" (dead at v1 and v2) is deleted;
    // "b"/"c" (live at retained versions) survive
    assert(TxLog.vacuum(spark, t, retainVersions = 1) == Seq("a"))
    assert(readVals(t, Some(1L)) == Set(2L))
    assert(readVals(t, Some(2L)) == Set(2L, 3L))
    assert(readVals(t, None) == Set(2L, 3L))
    val e = intercept[IllegalArgumentException](readVals(t, Some(0L)))
    assert(e.getMessage.contains("VACUUMED"))
    // idempotent: nothing left to delete
    assert(TxLog.vacuum(spark, t, retainVersions = 1).isEmpty)
    // horizon is MONOTONE: a later, laxer retention must not re-open
    // vacuumed history (the deleted files are not coming back)
    writeVals(t, "d", 4L)
    assert(TxLog.tryCommit(spark, t, 3L, Seq("d"), Nil))
    assert(TxLog.vacuum(spark, t, retainVersions = 10).isEmpty)
    val e2 = intercept[IllegalArgumentException](readVals(t, Some(0L)))
    assert(e2.getMessage.contains("VACUUMED"))
    assert(readVals(t, None) == Set(2L, 3L, 4L))
  }

  test("corruption is loud: log gap, remove of unknown file, travel past " +
      "the head") {
    val t = freshTable()
    writeVals(t, "a", 1L)
    assert(TxLog.tryCommit(spark, t, 0L, Seq("a"), Nil))
    // remove of a file no commit added
    assert(TxLog.tryCommit(spark, t, 1L, Nil, Seq("ghost")))
    val e1 = intercept[IllegalArgumentException](readVals(t, None))
    assert(e1.getMessage.contains("remove of unknown"))
    // travel past the head (on a fresh clean table)
    val t2 = freshTable()
    writeVals(t2, "a", 1L)
    assert(TxLog.tryCommit(spark, t2, 0L, Seq("a"), Nil))
    val e2 = intercept[IllegalArgumentException](readVals(t2, Some(5L)))
    assert(e2.getMessage.contains("time travel"))
    // a gap in the version sequence (skip v1)
    assert(TxLog.tryCommit(spark, t2, 2L, Nil, Nil))
    val e3 = intercept[IllegalArgumentException](readVals(t2, None))
    assert(e3.getMessage.contains("GAP"))
  }
}
