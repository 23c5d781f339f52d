package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** The PUBLIC Kafka wire format, the subset a CDC transport needs —
  * implemented from the protocol spec (kafka.apache.org/protocol), like
  * PgWire is for the Postgres v3 protocol. Deliberately pinned to
  * NON-FLEXIBLE api versions (ApiVersions v0, Metadata v1, Fetch v4) so
  * every field is fixed-width or length-prefixed — no tagged fields —
  * while still carrying magic-v2 RECORD BATCHES (the format every
  * modern broker serves):
  *
  *  - request framing: INT32 size, then api_key INT16, api_version
  *    INT16, correlation_id INT32, client_id NULLABLE_STRING, body;
  *  - response framing: INT32 size, correlation_id INT32, body;
  *  - record batch v2: baseOffset INT64, batchLength INT32,
  *    partitionLeaderEpoch INT32, magic INT8 = 2, crc UINT32 (CRC32C
  *    over everything from attributes on), attributes INT16,
  *    lastOffsetDelta INT32, base/maxTimestamp INT64, producer
  *    id/epoch/baseSequence (-1: idempotence unused), record count
  *    INT32, then varint-framed records (length, attributes INT8,
  *    timestampDelta varlong, offsetDelta varint, key, value, headers).
  *
  * The CONSUMER side VERIFIES the batch CRC before trusting a byte —
  * torn or bit-flipped batches are loud, never silently decoded. */
object KafkaWire {

  val ApiVersionsKey: Short = 18
  val MetadataKey: Short = 3
  val FetchKey: Short = 1
  val ProduceKey: Short = 0

  // ---- primitive codecs ------------------------------------------------

  def writeString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    out.writeShort(b.length); out.write(b)
  }

  def writeNullableString(out: DataOutputStream, s: Option[String]): Unit =
    s match {
      case None => out.writeShort(-1)
      case Some(v) => writeString(out, v)
    }

  def readString(in: DataInputStream): String = {
    val n = in.readShort()
    require(n >= 0, s"negative string length $n")
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }

  def readNullableString(in: DataInputStream): Option[String] = {
    val n = in.readShort()
    if (n < 0) None
    else { val b = new Array[Byte](n); in.readFully(b)
      Some(new String(b, UTF_8)) }
  }

  /** Zig-zag varint (the record-framing integer). */
  def writeVarint(buf: ByteBuffer, v: Int): Unit =
    writeVarlong(buf, v.toLong)

  def writeVarlong(buf: ByteBuffer, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zig-zag
    while ((v & ~0x7fL) != 0L) {
      buf.put(((v & 0x7f) | 0x80).toByte); v >>>= 7
    }
    buf.put(v.toByte)
  }

  def varlongSize(v0: Long): Int = {
    var v = (v0 << 1) ^ (v0 >> 63)
    var n = 1
    while ((v & ~0x7fL) != 0L) { n += 1; v >>>= 7 }
    n
  }

  def readVarlong(buf: ByteBuffer): Long = {
    var value = 0L; var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7fL) << shift; shift += 7; b = buf.get()
    }
    value |= (b & 0x7fL) << shift
    (value >>> 1) ^ -(value & 1) // un-zig-zag
  }

  def readVarint(buf: ByteBuffer): Int = readVarlong(buf).toInt

  // ---- request/response framing ----------------------------------------

  final case class RequestHeader(apiKey: Short, apiVersion: Short,
      correlationId: Int, clientId: Option[String])

  /** Read one size-framed request; None on clean EOF. */
  def readRequest(in: DataInputStream): Option[(RequestHeader, Array[Byte])] = {
    val size =
      try in.readInt()
      catch { case _: java.io.EOFException => return None }
    require(size >= 8 && size <= (64 << 20), s"absurd request size $size")
    val body = new Array[Byte](size)
    in.readFully(body)
    val buf = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val h = RequestHeader(buf.readShort(), buf.readShort(), buf.readInt(),
      readNullableString(buf))
    val rest = new Array[Byte](buf.available())
    buf.readFully(rest)
    Some((h, rest))
  }

  def writeRequest(out: DataOutputStream, h: RequestHeader,
      body: Array[Byte]): Unit = {
    val cid = h.clientId.map(_.getBytes(UTF_8).length + 2).getOrElse(2)
    out.writeInt(2 + 2 + 4 + cid + body.length)
    out.writeShort(h.apiKey); out.writeShort(h.apiVersion)
    out.writeInt(h.correlationId)
    writeNullableString(out, h.clientId)
    out.write(body); out.flush()
  }

  def writeResponse(out: DataOutputStream, correlationId: Int,
      body: Array[Byte]): Unit = {
    out.writeInt(4 + body.length)
    out.writeInt(correlationId)
    out.write(body); out.flush()
  }

  /** Read one size-framed response body for the given correlation id. */
  def readResponse(in: DataInputStream, expectCid: Int): Array[Byte] = {
    val size = in.readInt()
    require(size >= 4 && size <= (64 << 20), s"absurd response size $size")
    val cid = in.readInt()
    require(cid == expectCid,
      s"correlation id mismatch: got $cid, expected $expectCid")
    val body = new Array[Byte](size - 4)
    in.readFully(body)
    body
  }

  // ---- record batches (magic v2) ----------------------------------------

  final case class WireRecord(offset: Long, timestamp: Long,
      key: Array[Byte], value: Array[Byte])

  /** Encode records [base.offset …] into ONE magic-v2 batch. Timestamps
    * ride the records (deterministic — the caller supplies them, this
    * codec never reads a clock). */
  def encodeBatch(records: Seq[WireRecord]): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val baseOffset = records.head.offset
    val baseTs = records.head.timestamp
    // records section first (sizes needed for the header)
    val recBytes = records.map { r =>
      val keyLen = if (r.key == null) -1 else r.key.length
      val valLen = if (r.value == null) -1 else r.value.length
      val tsDelta = r.timestamp - baseTs
      val offDelta = (r.offset - baseOffset).toInt
      val bodySize = 1 + varlongSize(tsDelta) + varlongSize(offDelta.toLong) +
        varlongSize(keyLen.toLong) + math.max(0, keyLen) +
        varlongSize(valLen.toLong) + math.max(0, valLen) +
        varlongSize(0L) // headers count
      val buf = ByteBuffer.allocate(varlongSize(bodySize.toLong) + bodySize)
      writeVarlong(buf, bodySize.toLong)
      buf.put(0.toByte) // record attributes
      writeVarlong(buf, tsDelta)
      writeVarint(buf, offDelta)
      writeVarint(buf, keyLen)
      if (keyLen > 0) buf.put(r.key)
      writeVarint(buf, valLen)
      if (valLen > 0) buf.put(r.value)
      writeVarint(buf, 0) // headers
      buf.array()
    }
    val recsLen = recBytes.map(_.length).sum
    // the CRC32C covers attributes..records — build that slice first
    val afterCrc = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recsLen)
    afterCrc.putShort(0) // attributes: no compression, CreateTime
    afterCrc.putInt((records.last.offset - baseOffset).toInt) // lastOffsetDelta
    afterCrc.putLong(baseTs)
    afterCrc.putLong(records.map(_.timestamp).max)
    afterCrc.putLong(-1L) // producerId
    afterCrc.putShort(-1) // producerEpoch
    afterCrc.putInt(-1) // baseSequence
    afterCrc.putInt(records.size)
    recBytes.foreach(afterCrc.put)
    val crc = new java.util.zip.CRC32C
    crc.update(afterCrc.array())
    val batchLength = 4 + 1 + 4 + afterCrc.capacity() // plEpoch+magic+crc+rest
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(0) // partitionLeaderEpoch
    out.put(2.toByte) // magic
    out.putInt(crc.getValue.toInt)
    out.put(afterCrc.array())
    out.array()
  }

  /** Decode every batch in a record set, VERIFYING each batch's CRC32C —
    * a torn or corrupted batch throws, never decodes silently. */
  def decodeBatches(recordSet: Array[Byte]): Seq[WireRecord] = {
    val buf = ByteBuffer.wrap(recordSet)
    val out = Seq.newBuilder[WireRecord]
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong
      val batchLength = buf.getInt
      if (buf.remaining() < batchLength) {
        // a trailing partial batch (the broker may cut at maxBytes) is
        // legal — the consumer re-fetches from the last full offset
        buf.position(buf.limit())
      } else {
        val batch = new Array[Byte](batchLength)
        buf.get(batch)
        val b = ByteBuffer.wrap(batch)
        val plEpoch = b.getInt
        val magic = b.get()
        require(magic == 2, s"unsupported record batch magic $magic")
        val crcStored = b.getInt
        val crc = new java.util.zip.CRC32C
        crc.update(batch, 4 + 1 + 4, batch.length - 9)
        require(crc.getValue.toInt == crcStored,
          f"record batch CRC mismatch at offset $baseOffset " +
            f"(stored 0x$crcStored%08x, computed 0x${crc.getValue.toInt}%08x)" +
            " — refusing to decode a corrupted batch")
        val _ = plEpoch
        b.getShort // attributes
        b.getInt // lastOffsetDelta
        val baseTs = b.getLong
        b.getLong // maxTimestamp
        b.getLong; b.getShort; b.getInt // producer id/epoch/baseSequence
        val n = b.getInt
        (0 until n).foreach { _ =>
          val len = readVarlong(b).toInt
          val end = b.position() + len
          b.get() // record attributes
          val tsDelta = readVarlong(b)
          val offDelta = readVarint(b)
          val keyLen = readVarint(b)
          val key = if (keyLen < 0) null else {
            val k = new Array[Byte](keyLen); b.get(k); k }
          val valLen = readVarint(b)
          val value = if (valLen < 0) null else {
            val v = new Array[Byte](valLen); b.get(v); v }
          val headers = readVarint(b)
          require(headers == 0, s"unexpected $headers record headers")
          require(b.position() == end,
            s"record framing drift: at ${b.position()}, expected $end")
          out += WireRecord(baseOffset + offDelta, baseTs + tsDelta,
            key, value)
        }
      }
    }
    out.result()
  }
}
