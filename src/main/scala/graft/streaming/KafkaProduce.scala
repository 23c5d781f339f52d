package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import KafkaWire._

/** The PRODUCE side of the Kafka transport (r14): ships (key, value)
  * records to a topic as CRC32C'd magic-v2 batches over Produce v3 with
  * acks = -1 — every batch is acknowledged with its assigned base
  * offset, and the producer VERIFIES the offsets are exactly
  * contiguous, so a duplicated or dropped batch is loud at the
  * producer, not discovered downstream. Driver-side single-threaded by
  * design, like the capture side: ONE producer owns the partition's
  * order (the transport's ordering unit), and everything distributed
  * happens before (building the feed) or after (consuming the log). */
final class KafkaProduce(
    host: String,
    port: Int,
    topic: String,
    recordsPerBatch: Int = 1024) {

  /** Produce every (lsn, payload) record to partition 0; returns the
    * count shipped. */
  def run(records: Iterator[(Long, Array[Byte])]): Long =
    runPartitioned(records.map { case (lsn, payload) => (0, lsn, payload) })

  /** PARTITIONED produce (r15 — VERDICT item 2): each record arrives
    * with its partition (the caller's keying — hash of table/pk in the
    * production shape), is buffered per partition, and ships when its
    * partition's buffer fills — one CRC32C'd magic-v2 batch per
    * partition per request, offsets verified CONTIGUOUS per partition
    * (partition-local order is the transport's ordering unit; a
    * dropped or replayed batch is loud at the producer). */
  def runPartitioned(records: Iterator[(Int, Long, Array[Byte])]): Long = {
    val sock = new Socket(host, port)
    try {
      val in = new DataInputStream(
        new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(
        new BufferedOutputStream(sock.getOutputStream))
      var cid = 0
      // handshake: the broker must serve Produce v3
      writeRequest(out, RequestHeader(ApiVersionsKey, 0, cid,
        Some("graft-prod")), Array.empty)
      val av = new DataInputStream(new java.io.ByteArrayInputStream(
        readResponse(in, cid)))
      require(av.readShort() == 0, "ApiVersions errored")
      val n = av.readInt()
      val versions = (0 until n).map(_ =>
        (av.readShort(), av.readShort(), av.readShort()))
      require(versions.exists(v =>
          v._1 == ProduceKey && v._2 <= 3 && v._3 >= 3),
        s"broker does not serve Produce v3 (offers $versions)")
      cid += 1
      var shipped = 0L
      val sent = scala.collection.mutable.Map.empty[Int, Long]
        .withDefaultValue(0L)
      val expectedBase = scala.collection.mutable.Map.empty[Int, Long]
      val buffers = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]]
      def shipPartition(p: Int): Unit = {
        val buf = buffers(p)
        if (buf.isEmpty) return
        val recs = buf.toSeq.zipWithIndex.map { case ((lsn, payload), i) =>
          WireRecord(sent(p) + i, lsn,
            java.nio.ByteBuffer.allocate(8).putLong(lsn).array(), payload)
        }
        val batch = encodeBatch(recs)
        writeRequest(out, RequestHeader(ProduceKey, 3, cid,
          Some("graft-prod")),
          { val bos = new java.io.ByteArrayOutputStream()
            val o = new DataOutputStream(bos)
            writeNullableString(o, None) // transactional_id
            o.writeShort(-1) // acks: full
            o.writeInt(30000) // timeout_ms
            o.writeInt(1); writeString(o, topic)
            o.writeInt(1); o.writeInt(p) // one partition set
            o.writeInt(batch.length); o.write(batch)
            o.flush(); bos.toByteArray })
        val r = new DataInputStream(new java.io.ByteArrayInputStream(
          readResponse(in, cid)))
        cid += 1
        require(r.readInt() == 1 && readString(r) == topic,
          "produce topic drift")
        require(r.readInt() == 1 && r.readInt() == p,
          "produce partition drift")
        require(r.readShort() == 0, "produce errored")
        val base = r.readLong()
        r.readLong() // log_append_time
        // contiguity PER PARTITION: each batch must land exactly after
        // the previous one on its partition — a dropped or replayed
        // batch is the producer's to catch
        expectedBase.get(p).foreach(eb => require(base == eb,
          s"$topic/$p: batch landed at offset $base, expected $eb — " +
            "the partition log is not the produced sequence"))
        expectedBase(p) = base + recs.size
        sent(p) = sent(p) + recs.size
        shipped += recs.size
        buf.clear()
      }
      records.foreach { case (p, lsn, payload) =>
        val buf = buffers.getOrElseUpdate(p,
          scala.collection.mutable.ArrayBuffer.empty)
        buf += ((lsn, payload))
        if (buf.size >= recordsPerBatch) shipPartition(p)
      }
      buffers.keys.toSeq.sorted.foreach(shipPartition)
      shipped
    } finally sock.close()
  }
}
