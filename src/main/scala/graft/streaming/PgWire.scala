package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal codec for the public PostgreSQL frontend/backend wire protocol
  * (v3) subset a logical-replication client needs — the same frames the
  * reference drives through pgconn/pglogrepl (postrack.go:86-117, 287-341):
  * startup with `replication=database`, the `START_REPLICATION ... LOGICAL`
  * simple query, CopyBothResponse, and the CopyData-wrapped replication
  * sub-protocol (XLogData 'w', PrimaryKeepalive 'k', StandbyStatusUpdate
  * 'r'). Everything here is the published protocol: regular messages are
  * `type byte + int32 length(self-inclusive) + body`; the StartupMessage
  * alone has no type byte; LSNs print as `HI/LO` hex; timestamps are
  * microseconds since 2000-01-01.
  *
  * Pure byte-level functions — no sockets, no Spark — so both the capture
  * client ([[SocketCapture]]) and an in-test loopback server speak through
  * one audited codec.
  */
object PgWire {

  /** 2000-01-01 UTC in epoch millis: the Postgres timestamp origin. */
  private val PgEpochMs = 946684800000L

  def nowMicros(): Long = (System.currentTimeMillis() - PgEpochMs) * 1000L

  def lsnString(lsn: Long): String =
    f"${(lsn >>> 32).toInt & 0xffffffffL}%X/${lsn & 0xffffffffL}%X"

  // ---- framing ----------------------------------------------------------

  /** A regular (typed) protocol message: `typ` + int32 len + body. */
  def writeMessage(out: DataOutputStream, typ: Char, body: Array[Byte]): Unit = {
    out.writeByte(typ.toByte)
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()
  }

  /** Read one typed message; EOFException when the peer closed. */
  def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val typ = in.readByte().toChar
    val len = in.readInt()
    if (len < 4 || len > 64 * 1024 * 1024)
      throw new IllegalArgumentException(s"implausible message length $len for type '$typ'")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (typ, body)
  }

  // ---- startup ----------------------------------------------------------

  /** StartupMessage (no type byte): int32 len, int32 196608 (protocol 3.0),
    * key\0value\0 pairs, trailing \0. The replication session is requested
    * exactly as the reference does — `replication=database` in the startup
    * parameters (postrack.go:98). */
  def writeStartup(out: DataOutputStream, params: Map[String, String]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    params.foreach { case (k, v) =>
      body.write(k.getBytes(UTF_8)); body.write(0)
      body.write(v.getBytes(UTF_8)); body.write(0)
    }
    body.write(0)
    val bytes = body.toByteArray
    out.writeInt(bytes.length + 8)
    out.writeInt(196608)
    out.write(bytes)
    out.flush()
  }

  /** Server side: read a StartupMessage, return its parameters. */
  def readStartup(in: DataInputStream): Map[String, String] = {
    val len = in.readInt()
    val proto = in.readInt()
    require(proto == 196608, s"unsupported protocol version $proto")
    val body = new Array[Byte](len - 8)
    in.readFully(body)
    // key\0value\0...\0 — split on NULs, drop the trailing empty
    val parts = new String(body, UTF_8).split('\u0000')
    parts.grouped(2).collect { case Array(k, v) if k.nonEmpty => k -> v }.toMap
  }

  def query(sql: String): Array[Byte] = {
    val b = sql.getBytes(UTF_8)
    val body = new Array[Byte](b.length + 1)
    System.arraycopy(b, 0, body, 0, b.length)
    body
  }

  def parseQuery(body: Array[Byte]): String = {
    val end = body.indexOf(0.toByte)
    new String(body, 0, if (end < 0) body.length else end, UTF_8)
  }

  /** CopyBothResponse body: int8 overall-format 0, int16 column count 0. */
  def copyBothBody: Array[Byte] = Array[Byte](0, 0, 0)

  /** AuthenticationOk body: int32 0. */
  def authOkBody: Array[Byte] = Array[Byte](0, 0, 0, 0)

  /** ReadyForQuery body: 'I' (idle). */
  def readyBody: Array[Byte] = Array[Byte]('I'.toByte)

  // ---- replication sub-protocol (CopyData payloads) ---------------------

  final case class XLogData(walStart: Long, walEnd: Long, serverTimeUs: Long, payload: Array[Byte])
  final case class Keepalive(walEnd: Long, serverTimeUs: Long, replyRequested: Boolean)
  final case class StandbyStatus(write: Long, flush: Long, apply: Long, clientTimeUs: Long, replyRequested: Boolean)

  def encodeXLogData(d: XLogData): Array[Byte] = {
    val buf = ByteBuffer.allocate(25 + d.payload.length)
    buf.put('w'.toByte).putLong(d.walStart).putLong(d.walEnd).putLong(d.serverTimeUs).put(d.payload)
    buf.array()
  }

  def encodeKeepalive(k: Keepalive): Array[Byte] = {
    val buf = ByteBuffer.allocate(18)
    buf.put('k'.toByte).putLong(k.walEnd).putLong(k.serverTimeUs)
      .put(if (k.replyRequested) 1.toByte else 0.toByte)
    buf.array()
  }

  def encodeStandbyStatus(s: StandbyStatus): Array[Byte] = {
    val buf = ByteBuffer.allocate(34)
    buf.put('r'.toByte).putLong(s.write).putLong(s.flush).putLong(s.apply)
      .putLong(s.clientTimeUs).put(if (s.replyRequested) 1.toByte else 0.toByte)
    buf.array()
  }

  /** Parse a CopyData payload from the PRIMARY ('w' or 'k'). */
  def parsePrimaryPayload(bytes: Array[Byte]): Either[Keepalive, XLogData] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.get().toChar match {
      case 'w' =>
        val start = buf.getLong; val end = buf.getLong; val ts = buf.getLong
        val payload = new Array[Byte](buf.remaining())
        buf.get(payload)
        Right(XLogData(start, end, ts, payload))
      case 'k' =>
        Left(Keepalive(buf.getLong, buf.getLong, buf.get() == 1))
      case other =>
        throw new IllegalArgumentException(s"unknown primary CopyData tag '$other'")
    }
  }

  /** Parse a CopyData payload from the STANDBY ('r'). */
  def parseStandbyStatus(bytes: Array[Byte]): StandbyStatus = {
    val buf = ByteBuffer.wrap(bytes)
    val tag = buf.get().toChar
    require(tag == 'r', s"expected standby status 'r', got '$tag'")
    StandbyStatus(buf.getLong, buf.getLong, buf.getLong, buf.getLong, buf.get() == 1)
  }

  /** Drain any complete, already-buffered typed messages without blocking —
    * how the server side picks up standby status updates between frame
    * sends. Returns the drained (type, body) pairs. */
  def drainAvailable(in: DataInputStream): Seq[(Char, Array[Byte])] = {
    val out = Seq.newBuilder[(Char, Array[Byte])]
    // a typed message is at least 5 bytes (type + len); readMessage blocks
    // only if a partial message is buffered, which a flushing peer avoids
    while (in.available() >= 5) out += readMessage(in)
    out.result()
  }

  /** True when the exception marks a peer disconnect rather than a bug. */
  def isDisconnect(t: Throwable): Boolean = t match {
    case _: EOFException => true
    case _: java.net.SocketException => true
    case _: java.io.IOException if t.getMessage != null &&
      (t.getMessage.contains("closed") || t.getMessage.contains("reset")) => true
    case _ => false
  }
}
