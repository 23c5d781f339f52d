package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

import graft.cdc.SlotStore
import KafkaWire._

/** The Kafka-transported CDC consumer loop — [[SocketCapture]]'s durable
  * contract over the Kafka wire protocol instead of the Postgres one
  * (r14 — VERDICT item 4): connect, ApiVersions handshake, Metadata
  * discovery (topic/partition/leader verified), then a Fetch loop from
  * the consumer's own DURABLE OFFSET, CRC-verifying every record batch,
  * buffering frames and flushing to the append-only frame lake every
  * `flushEvery` records. Only AFTER a flush lands does the watermark
  * advance (SlotStore.ack, monotone — the watermark here is the NEXT
  * offset to fetch, i.e. the count of durably-landed records); a
  * reconnect re-fetches exactly the records that died in the buffer,
  * and the flush filter drops any server replay below the watermark —
  * at-least-once transport, exactly-once lake contents, the same split
  * the Postgres capture proves.
  *
  * Driver-side single-threaded BY DESIGN, like every Kafka consumer in
  * a group owns its partitions: the distributed half is everything
  * downstream of the lake. */
final class KafkaCapture(
    host: String,
    port: Int,
    topic: String,
    slot: String,
    slots: SlotStore,
    spark: SparkSession,
    frameLakeDir: String,
    flushEvery: Int = 4096,
    maxReconnects: Int = 5) {
  import KafkaCapture.CaptureStats

  private val buffer = ArrayBuffer.empty[(Long, Long, Array[Byte])]
  private var captured = 0L
  private var flushes = 0L

  /** Flush buffered records above the durable watermark to the lake as
    * ONE parquet append (lsn, data), then advance the watermark to the
    * last flushed offset + 1. */
  private def flush(): Unit = if (buffer.nonEmpty) {
    val watermark = slots.confirmedFlushLsn(slot)
    val fresh = buffer.filter(_._1 >= watermark)
    if (fresh.nonEmpty) {
      import spark.implicits._
      fresh.toSeq.map { case (_, lsn, frame) => (lsn, frame) }
        .toDF("lsn", "data")
        .coalesce(1).write.mode("append").parquet(frameLakeDir)
      captured += fresh.size
      flushes += 1
      slots.ack(slot, fresh.last._1 + 1)
    }
    buffer.clear()
  }

  private def handshake(in: DataInputStream, out: DataOutputStream,
      cid: Int): Int = {
    var c = cid
    writeRequest(out, RequestHeader(ApiVersionsKey, 0, c, Some("graft")),
      Array.empty)
    val av = new DataInputStream(new java.io.ByteArrayInputStream(
      readResponse(in, c)))
    require(av.readShort() == 0, "ApiVersions errored")
    val n = av.readInt()
    val versions = (0 until n).map(_ =>
      (av.readShort(), av.readShort(), av.readShort()))
    require(versions.exists(v => v._1 == FetchKey && v._2 <= 4 && v._3 >= 4),
      s"broker does not serve Fetch v4 (offers $versions)")
    c += 1
    writeRequest(out, RequestHeader(MetadataKey, 1, c, Some("graft")),
      { val bos = new java.io.ByteArrayOutputStream()
        val o = new DataOutputStream(bos)
        o.writeInt(1); writeString(o, topic); o.flush(); bos.toByteArray })
    val md = new DataInputStream(new java.io.ByteArrayInputStream(
      readResponse(in, c)))
    val nBrokers = md.readInt()
    require(nBrokers >= 1, "no brokers in metadata")
    (0 until nBrokers).foreach { _ =>
      md.readInt(); readString(md); md.readInt(); md.readShort() }
    md.readInt() // controller
    val nTopics = md.readInt()
    require(nTopics == 1, s"expected 1 topic, got $nTopics")
    require(md.readShort() == 0, s"$topic errored in metadata")
    require(readString(md) == topic, "topic name drift")
    md.readBoolean()
    val nParts = md.readInt()
    require(nParts == 1, s"$topic must have exactly 1 partition, has $nParts")
    require(md.readShort() == 0 && md.readInt() == 0,
      "partition 0 errored in metadata")
    require(md.readInt() == 0, "partition 0 has a foreign leader")
    c + 1
  }

  private def fetchOnce(in: DataInputStream, out: DataOutputStream,
      cid: Int, offset: Long): (Seq[WireRecord], Long) = {
    writeRequest(out, RequestHeader(FetchKey, 4, cid, Some("graft")),
      { val bos = new java.io.ByteArrayOutputStream()
        val o = new DataOutputStream(bos)
        o.writeInt(-1) // replica_id: consumer
        o.writeInt(500); o.writeInt(1) // max_wait_ms, min_bytes
        o.writeInt(16 << 20); o.writeByte(0) // max_bytes, read_uncommitted
        o.writeInt(1); writeString(o, topic)
        o.writeInt(1)
        o.writeInt(0); o.writeLong(offset); o.writeInt(16 << 20)
        o.flush(); bos.toByteArray })
    val r = new DataInputStream(new java.io.ByteArrayInputStream(
      readResponse(in, cid)))
    r.readInt() // throttle
    require(r.readInt() == 1 && readString(r) == topic, "fetch topic drift")
    require(r.readInt() == 1 && r.readInt() == 0, "fetch partition drift")
    require(r.readShort() == 0, "fetch partition errored")
    val hwm = r.readLong()
    r.readLong() // last_stable_offset
    require(r.readInt() == 0, "unexpected aborted txns")
    val setLen = r.readInt()
    val recordSet = new Array[Byte](setLen)
    r.readFully(recordSet)
    // CRC-verified decode; a batch may START below the requested offset
    // (batch granularity) — drop the replayed prefix
    (decodeBatches(recordSet).filter(_.offset >= offset), hwm)
  }

  /** Run the capture to the end of the topic; returns stats. */
  def run(): CaptureStats = {
    var reconnects = 0
    var done = false
    while (!done) {
      val sock = new Socket(host, port)
      try {
        val in = new DataInputStream(
          new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(
          new BufferedOutputStream(sock.getOutputStream))
        try {
          var cid = handshake(in, out, 0)
          while (!done) {
            val offset = slots.confirmedFlushLsn(slot) + buffer.size
            val (recs, hwm) = fetchOnce(in, out, cid, offset)
            cid += 1
            recs.foreach { rec =>
              require(rec.key != null && rec.key.length == 8,
                s"record at offset ${rec.offset} has no 8-byte lsn key")
              val lsn = java.nio.ByteBuffer.wrap(rec.key).getLong
              buffer += ((rec.offset, lsn, rec.value))
              if (buffer.size >= flushEvery) flush()
            }
            if (recs.isEmpty && offset >= hwm) { flush(); done = true }
          }
        } catch {
          case e @ (_: java.io.IOException) =>
            // mid-stream disconnect: the buffer dies with the session —
            // the durable watermark does not; resume re-fetches exactly
            // the unflushed suffix
            buffer.clear()
            reconnects += 1
            if (reconnects > maxReconnects) throw new IllegalStateException(
              s"$topic: gave up after $maxReconnects reconnects", e)
        }
      } finally if (!sock.isClosed) sock.close()
    }
    CaptureStats(captured, flushes, reconnects,
      slots.confirmedFlushLsn(slot))
  }
}

object KafkaCapture {
  final case class CaptureStats(captured: Long, flushes: Long,
      reconnects: Int, watermark: Long)
}
