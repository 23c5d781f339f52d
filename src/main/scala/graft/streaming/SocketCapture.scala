package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

import graft.cdc.SlotStore
import PgWire._

/** The reference's live capture loop — `connect` with
  * `replication=database`, `START_REPLICATION ... LOGICAL`, ReceiveMessage,
  * standby status updates (postrack.go:86-117, 287-341) — over a real TCP
  * socket, feeding the frame lake that [[PgOutputStream]] decodes.
  *
  * Division of labor (deliberately the reference's): capture is ONE
  * replication connection per slot — a protocol constraint, not a design
  * choice; Postgres serves a slot to a single consumer. The distributed part
  * of the pipeline is everything downstream of the lake (decode, apply,
  * analytics). So this class is driver-side and single-threaded by design,
  * and its write path is append-only parquet batches that any number of
  * executors then read.
  *
  * Durability contract, mirroring `Changes(lsn+1)` (postrack.go:287-309):
  * received XLogData frames buffer in memory and flush to the lake every
  * `flushEvery` frames; only AFTER a flush lands does the slot's
  * `confirmed_flush_lsn` advance ([[SlotStore.ack]], monotone), and standby
  * status updates report exactly that durable watermark (`flush`/`apply`)
  * next to the volatile `write` position (last frame received) — the same
  * split pglogrepl's StandbyStatusUpdate carries. A reconnect therefore asks
  * for `confirmedFlushLsn + 1`: frames that died in the buffer are re-sent,
  * frames already in the lake are never re-requested, and a server replay
  * below the watermark is dropped by the flush filter. The primary re-sends
  * RelationMessages per session (as Postgres does); they arrive above the
  * watermark and re-register idempotently in the decode.
  */
final class SocketCapture(
    host: String,
    port: Int,
    database: String,
    user: String,
    slot: String,
    publication: String,
    slots: SlotStore,
    spark: SparkSession,
    frameLakeDir: String,
    flushEvery: Int = 256,
    maxReconnects: Int = 5) {
  import SocketCapture.CaptureStats

  /** Volatile receive position (the reference's `conn.lsn`, set on every
    * XLogData, postrack.go:367); durable position lives in the SlotStore. */
  private var lastReceived: Long = slots.confirmedFlushLsn(slot)
  private val buffer = ArrayBuffer.empty[(Long, Array[Byte])]
  private var captured = 0L

  private def flush(): Unit = if (buffer.nonEmpty) {
    val watermark = slots.confirmedFlushLsn(slot)
    val fresh = buffer.filter(_._1 > watermark).toSeq
    if (fresh.nonEmpty) {
      import spark.implicits._
      fresh.toDF("lsn", "data").coalesce(1)
        .write.mode("append").parquet(frameLakeDir)
      slots.ack(slot, fresh.map(_._1).max)
      captured += fresh.size
    }
    buffer.clear()
  }

  private def sendStatus(out: DataOutputStream): Unit =
    writeMessage(out, 'd', encodeStandbyStatus(StandbyStatus(
      write = lastReceived,
      flush = slots.confirmedFlushLsn(slot),
      apply = slots.confirmedFlushLsn(slot),
      clientTimeUs = nowMicros(),
      replyRequested = false)))

  /** One replication session: startup handshake, START_REPLICATION from the
    * durable watermark, then the receive loop until the primary finishes
    * (CopyDone → true) or drops the connection (→ false). */
  private def session(): Boolean = {
    val sock = new Socket(host, port)
    try {
      sock.setTcpNoDelay(true)
      // fail LOUDLY if the primary wedges: a real primary keepalives well
      // inside this window, so a minute of wire silence is a hang, not a
      // quiet stream — SocketTimeoutException is not a disconnect, so it
      // propagates out of run() instead of burning reconnect attempts
      sock.setSoTimeout(60000)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

      writeStartup(out, Map(
        "user" -> user, "database" -> database, "replication" -> "database"))
      // consume AuthenticationOk / ParameterStatus / BackendKeyData → ReadyForQuery
      var ready = false
      while (!ready) readMessage(in) match {
        case ('R', body) =>
          require(java.nio.ByteBuffer.wrap(body).getInt == 0,
            "unsupported authentication request (only AuthenticationOk)")
        case ('Z', _) => ready = true
        case ('E', body) => throw new IllegalStateException(
          s"server error during startup: ${new String(body, java.nio.charset.StandardCharsets.UTF_8)}")
        case _ => () // ParameterStatus, BackendKeyData, NoticeResponse
      }

      val startLsn = slots.confirmedFlushLsn(slot) + 1
      writeMessage(out, 'Q', query(
        s"START_REPLICATION SLOT $slot LOGICAL ${lsnString(startLsn)} " +
          s"(proto_version '1', publication_names '$publication')"))
      readMessage(in) match {
        case ('W', _) => () // CopyBothResponse — streaming begins
        case ('E', body) => throw new IllegalStateException(
          s"START_REPLICATION rejected: ${new String(body, java.nio.charset.StandardCharsets.UTF_8)}")
        case (t, _) => throw new IllegalStateException(s"expected CopyBothResponse, got '$t'")
      }

      var clean = false
      var done = false
      while (!done) readMessage(in) match {
        case ('d', payload) => parsePrimaryPayload(payload) match {
          case Right(x) =>
            lastReceived = x.walStart
            buffer += (x.walStart -> x.payload)
            if (buffer.size >= flushEvery) { flush(); sendStatus(out) }
          case Left(k) =>
            if (k.replyRequested) sendStatus(out)
        }
        case ('c', _) => // CopyDone: primary finished the stream
          flush(); sendStatus(out)
          writeMessage(out, 'c', Array.emptyByteArray)
          clean = true; done = true
        case ('E', body) => throw new IllegalStateException(
          s"server error mid-stream: ${new String(body, java.nio.charset.StandardCharsets.UTF_8)}")
        case _ => () // NoticeResponse etc.
      }
      clean
    } finally sock.close()
  }

  /** Run sessions until a clean CopyDone end, reconnecting from the durable
    * watermark on drops — at most `maxReconnects` dirty sessions. Frames
    * buffered at a disconnect are flushed before reconnecting (they were
    * received; the lake is the durability point, not the socket). */
  def run(): CaptureStats = {
    var sessions = 0
    var clean = false
    while (!clean && sessions <= maxReconnects) {
      sessions += 1
      clean =
        try session()
        catch {
          case t: Throwable if isDisconnect(t) => false
        }
      flush() // persist anything the dying session had buffered
    }
    if (!clean) throw new IllegalStateException(
      s"capture did not end cleanly after $sessions sessions (maxReconnects=$maxReconnects)")
    CaptureStats(sessions, captured, clean)
  }
}

object SocketCapture {
  final case class CaptureStats(sessions: Int, framesCaptured: Long, cleanEnd: Boolean)
}
