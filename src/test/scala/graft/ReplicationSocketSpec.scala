package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeEvent, DeleteMsg, InsertMsg, PgColumn, PgOutput, PgTuple, RelationMsg, SlotStore, TruncateMsg, UpdateMsg}
import graft.streaming.{PgOutputStream, SocketCapture}
import graft.streaming.LoopbackPgServer

/** The last reference seam, closed without a database: the live capture loop
  * (postrack.go:86-117, 287-341) driven over a REAL TCP socket against an
  * in-test primary speaking the public replication wire protocol. Frames
  * arrive as CopyData-wrapped XLogData, the ack loop answers keepalives and
  * flush boundaries with standby status updates, a mid-stream hard
  * disconnect forces a reconnect that resumes from `confirmed_flush_lsn + 1`
  * with per-session Relation re-sends — and the captured lake decodes to
  * exactly the batch replay of the pristine logical feed. */
class ReplicationSocketSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("socket capture: TCP frames + standby acks + disconnect/reconnect == batch replay") {
    // ---- the logical feed: two tables, all five op shapes
    val relAccounts = RelationMsg(800, "public", "accounts", 'd'.toByte,
      Seq("pk", "v").map(c => PgColumn(0, c, 25, -1)))
    val relEvents = RelationMsg(801, "public", "events", 'd'.toByte,
      Seq("id", "kind").map(c => PgColumn(0, c, 25, -1)))
    def tup(vs: String*) = PgTuple(vs.map(Option(_)))
    // data frames on a coarse LSN grid (100·(i+1)) so per-session relation
    // re-sends (watermark+1, +2, ...) can never collide with a data LSN
    val data: Seq[(Long, Array[Byte])] = Seq(
      InsertMsg(800, tup("1", "a")),
      InsertMsg(800, tup("2", "b")),
      InsertMsg(801, tup("10", "x")),
      UpdateMsg(800, None, None, tup("1", "a1")),
      InsertMsg(801, tup("11", "y")),
      DeleteMsg(800, 'O'.toByte, tup("2", "b")),
      TruncateMsg(0, Seq(801)), // frame 7: the disconnect lands right here
      InsertMsg(801, tup("12", "z")),
      InsertMsg(800, tup("3", "c")),
      UpdateMsg(801, None, None, tup("12", "z2")),
      InsertMsg(800, tup("4", "d")),
      InsertMsg(800, tup("5", "e"))
    ).zipWithIndex.map { case (m, i) => (100L * (i + 1)) -> PgOutput.encode(m) }

    val server = new LoopbackPgServer(
      relations = Seq(PgOutput.encode(relAccounts), PgOutput.encode(relEvents)),
      data = data,
      dropAfterFrames = 7).start()

    val lakeDir = tmp("socklake")
    val slots = new SlotStore(tmp("sockslots"))
    slots.setSlot("sock_slot")
    val stats = new SocketCapture(
      host = "127.0.0.1", port = server.port, database = "db", user = "graft",
      slot = "sock_slot", publication = "pub_sock_slot",
      slots = slots, spark = spark, frameLakeDir = lakeDir,
      flushEvery = 4).run()
    server.awaitFinished()

    // ---- session/reconnect shape
    assert(stats.cleanEnd && stats.sessions == 2,
      s"expected one dirty + one clean session, got $stats")
    val s = server.sessions
    assert(s.size == 2)
    assert(s(0).startupParams.get("replication").contains("database"))
    assert(s(0).startLsn == 1L, "fresh slot starts at confirmed(0)+1")
    assert(s(0).droppedDirty)
    // frames buffered at the drop were flushed before reconnecting, so the
    // resume point is last-received + 1, not last-status + 1
    assert(s(1).startLsn == 701L,
      s"reconnect must resume from confirmed_flush_lsn+1, got ${s(1).startLsn}")
    assert(!s(1).droppedDirty)

    // ---- ack loop: every session produced standby statuses; the durable
    // `flush` position only ever advances; the final ack is the feed's end
    assert(s.forall(_.statuses.nonEmpty), "each session must see standby status updates")
    val flushes = s.toSeq.flatMap(_.statuses.map(_.flush))
    assert(flushes == flushes.sorted, s"flush watermark must be monotone: $flushes")
    assert(s(1).statuses.last.flush == 1200L)
    assert(slots.confirmedFlushLsn("sock_slot") == 1200L)
    assert(stats.framesCaptured >= data.size,
      "all data frames (plus per-session relation re-sends) must be captured")

    // ---- convergence: decoding the captured lake == batch replay of the
    // pristine feed (relations once, at the head)
    val oracleFrames = (Seq(
      1L -> PgOutput.encode(relAccounts),
      2L -> PgOutput.encode(relEvents)) ++ data).toDF("lsn", "data")
    def events(df: org.apache.spark.sql.DataFrame): Set[ChangeEvent] =
      PgOutput.decodeFeed(spark, df).as[ChangeEvent].collect().toSet
    val captured = events(spark.read.parquet(lakeDir))
    val replay = events(oracleFrames)
    assert(captured == replay,
      s"captured-lake decode must equal batch replay; only-captured=${captured -- replay}, only-replay=${replay -- captured}")

    // ---- and the captured lake feeds the standard streaming pipeline:
    // decodeStream + captureTo over the socket-written lake, acking a
    // consumer slot to the same watermark
    val applySlots = new SlotStore(tmp("sockapply"))
    applySlots.setSlot("apply")
    val handled = scala.collection.mutable.ArrayBuffer[ChangeEvent]()
    val q = PgOutputStream.captureTo(
      PgOutputStream.decodeStream(spark,
        PgOutputStream.resumeFrames(spark, lakeDir, applySlots, "apply")),
      tmp("sockck"), applySlots, "apply") { b => handled ++= b.collect() }
    try q.processAllAvailable() finally q.stop()
    assert(handled.toSet == replay)
    assert(applySlots.confirmedFlushLsn("apply") == 1200L)
  }
}
