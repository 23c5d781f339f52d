package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, element_at}

import graft.cdc.{Bootstrap, ChangeEvent, DeleteMsg, InsertMsg, PgColumn, PgOutput, PgTuple, Publication, RelationMsg, TruncateMsg, UpdateMsg}
import graft.streaming.LoopbackPgServer

/** The reference's README-level usage reproduced 1:1:
  * `Bootstrap(slot, tables, events, lsn, handle)` (postrack.go:320-338)
  * against the loopback primary — including the part the composite exists
  * for: a primary that dies mid-stream, and a LATER re-bootstrap (new
  * process, same state dir) that resumes from the durable watermark and
  * converges to exactly the batch replay of the full feed. */
class BootstrapSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val relAccounts = RelationMsg(900, "public", "accounts", 'd'.toByte,
    Seq("pk", "v").map(c => PgColumn(0, c, 25, -1)))
  private val relUsers = RelationMsg(901, "public", "users", 'd'.toByte,
    Seq("id", "kind").map(c => PgColumn(0, c, 25, -1)))
  private def tup(vs: String*) = PgTuple(vs.map(Option(_)))

  // coarse LSN grid so per-session relation re-sends (watermark+1, +2)
  // never collide with data LSNs — same discipline as ReplicationSocketSpec
  private val data: Seq[(Long, Array[Byte])] = Seq(
    InsertMsg(900, tup("1", "a")),
    InsertMsg(901, tup("10", "x")),
    UpdateMsg(900, None, None, tup("1", "a1")),
    InsertMsg(900, tup("2", "b")),
    DeleteMsg(900, 'O'.toByte, tup("2", "b")),
    InsertMsg(901, tup("11", "y")),
    TruncateMsg(0, Seq(901)),
    InsertMsg(900, tup("3", "c")),
    UpdateMsg(901, None, None, tup("11", "y2")),
    InsertMsg(900, tup("4", "d"))
  ).zipWithIndex.map { case (m, i) => (100L * (i + 1)) -> PgOutput.encode(m) }

  private def replay(frames: Seq[(Long, Array[Byte])]): Set[ChangeEvent] = {
    val withRels = (Seq(
      1L -> PgOutput.encode(relAccounts),
      2L -> PgOutput.encode(relUsers)) ++ frames).toDF("lsn", "data")
    PgOutput.decodeFeed(spark, withRels).as[ChangeEvent].collect().toSet
  }

  private val allTables = Seq(Publication("accounts"), Publication("users"))

  test("bootstrap: mid-stream kill + later re-bootstrap == batch replay") {
    val state = tmp("bootstate")
    val handled = scala.collection.mutable.ArrayBuffer[ChangeEvent]()

    // ---- run 1: the primary serves only a prefix of the WAL and hard-drops
    // the socket mid-prefix (no CopyDone); Bootstrap's capture loop must
    // reconnect, finish the prefix cleanly, and dispatch it to handle
    val server1 = new LoopbackPgServer(
      relations = Seq(PgOutput.encode(relAccounts), PgOutput.encode(relUsers)),
      data = data.take(6), dropAfterFrames = 3).start()
    val stats1 = Bootstrap.run(spark,
      host = "127.0.0.1", port = server1.port, database = "db", user = "graft",
      slot = "boot_slot", tables = allTables, stateDir = state,
      flushEvery = 2) { b => handled ++= b.collect() }
    server1.awaitFinished()

    assert(stats1.capture.sessions == 2,
      s"kill mid-stream must force exactly one reconnect: ${stats1.capture}")
    // the durable slot SELECTION must still be the caller's capture slot,
    // not the internal dispatch slot Bootstrap creates alongside it
    assert(new graft.cdc.SlotStore(s"$state/slots").currentSlot
      .contains("boot_slot"))
    assert(stats1.confirmedFlushLsn == 600L, s"prefix watermark: $stats1")
    assert(stats1.handledLsn == 600L,
      s"dispatch watermark must reach the capture watermark: $stats1")
    assert(handled.toSet == replay(data.take(6)),
      "run 1 must dispatch exactly the prefix replay")

    // ---- run 2: a NEW primary (fresh process on the feed) serving the full
    // WAL; re-bootstrap with the SAME state dir resumes from the durable
    // watermark — only the suffix is re-requested, handle sees no duplicates
    val server2 = new LoopbackPgServer(
      relations = Seq(PgOutput.encode(relAccounts), PgOutput.encode(relUsers)),
      data = data, dropAfterFrames = Int.MaxValue).start()
    val stats2 = Bootstrap.run(spark,
      host = "127.0.0.1", port = server2.port, database = "db", user = "graft",
      slot = "boot_slot", tables = allTables, stateDir = state,
      flushEvery = 2) { b => handled ++= b.collect() }
    server2.awaitFinished()

    assert(stats2.capture.sessions == 1, s"clean resume: ${stats2.capture}")
    assert(server2.sessions.head.startLsn == 601L,
      s"re-bootstrap must START_REPLICATION from confirmed_flush_lsn+1, " +
        s"got ${server2.sessions.head.startLsn}")
    assert(stats2.confirmedFlushLsn == 1000L && stats2.handledLsn == 1000L)
    assert(handled.toSet == replay(data), "runs 1+2 must converge to the full replay")
    assert(handled.size == handled.toSet.size, "no duplicate dispatches")
  }

  test("bootstrap: publish mask, condition, and column selector slice the dispatch") {
    val state = tmp("bootmask")
    val server = new LoopbackPgServer(
      relations = Seq(PgOutput.encode(relAccounts), PgOutput.encode(relUsers)),
      data = data, dropAfterFrames = Int.MaxValue).start()
    val handled = scala.collection.mutable.ArrayBuffer[ChangeEvent]()
    // accounts: INSERTs only (per-table mask ∩ global), with a condition on
    // the after-image; users: selector narrows the published columns
    Bootstrap.run(spark,
      host = "127.0.0.1", port = server.port, database = "db", user = "graft",
      slot = "mask_slot",
      tables = Seq(
        Publication("accounts", eventMask = Set("INSERT"),
          condition = Some(element_at(col("after"), "v") =!= "c")),
        Publication("users", selector = Seq("kind"))),
      events = Set("INSERT", "UPDATE"), // global publish= list: no DELETE/TRUNCATE
      stateDir = state) { b => handled ++= b.collect() }
    server.awaitFinished()

    val full = replay(data)
    val expected = full.collect {
      case e if e.table_name == "accounts" && e.op == "INSERT"
        && e.after("v") != "c" => e
      case e if e.table_name == "users" && (e.op == "INSERT" || e.op == "UPDATE") =>
        e.copy(
          before = Option(e.before).map(_.filter(_._1 == "kind")).orNull,
          after = Option(e.after).map(_.filter(_._1 == "kind")).orNull)
    }
    assert(handled.toSet == expected,
      s"only-handled=${handled.toSet -- expected}, only-expected=${expected -- handled.toSet}")
    // the DELETE, the TRUNCATE, and the filtered-out INSERT are all absent
    assert(!handled.exists(e => e.op == "DELETE" || e.op == "TRUNCATE"))
  }
}
