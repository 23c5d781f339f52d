package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}

import scala.collection.mutable.ArrayBuffer

import KafkaWire._

/** In-process broker: a TCP server speaking the CDC-transport subset of
  * the PUBLIC Kafka wire protocol — the [[LoopbackPgServer]] pattern
  * applied to the OTHER production CDC transport (r14 — VERDICT item 4:
  * CDC feeds overwhelmingly transit Kafka; this gates a real
  * socket-transported feed end-to-end without a broker install).
  * Serves, with non-flexible api versions (fixed-width framing):
  *
  *  - ApiVersions v0 — the handshake every client opens with;
  *  - Metadata v1 — one broker (itself), one topic, one partition,
  *    leader 0: the discovery round-trip;
  *  - Fetch v4 — magic-v2 record batches (CRC32C'd), served from the
  *    requested offset, paced `recordsPerBatch` per response; the
  *    response's high watermark tells the consumer where the log ends.
  *
  * The feed is an ITERATOR FACTORY ordered by offset — the broker holds
  * O(batch) records in memory (a real broker serves from its log
  * segments, it does not load them); a session's fetches advance a
  * cursor, an out-of-order (reconnect) fetch below the cursor restarts
  * the iterator — O(feed) per session, never O(feed²) across fetches.
  *
  * `dropAfterRecords`: the FIRST session hard-closes the socket after
  * serving that many records — the mid-stream disconnect every durable
  * consumer must survive (resume from its flushed watermark, re-fetch
  * only what died in its buffer). */
final class LoopbackKafkaBroker(
    topic: String,
    feed: () => Iterator[(Long, Array[Byte])],
    total: Long,
    dropAfterRecords: Long,
    recordsPerBatch: Int = 1024,
    producible: Boolean = false,
    nPartitions: Int = 1) {

  require(nPartitions >= 1, s"nPartitions must be positive: $nPartitions")
  // the feed-iterator mode predates partitioning and stays 1-partition;
  // multi-partition topics are PRODUCIBLE (the log is born partitioned
  // by the producer's keying — the production shape)
  require(nPartitions == 1 || producible,
    "a multi-partition loopback topic must be producible")

  /** PRODUCIBLE mode (r14 — the other direction of the transport): the
    * topic is one in-memory LOG PER PARTITION the Produce api appends
    * to (offsets assigned at append, partition-local and contiguous —
    * a real broker's segment append) and Fetch serves from;
    * `feed`/`total` are ignored. Synchronized coarsely — the loopback
    * exists to gate wire framing and the durable consumer contract,
    * not broker throughput. */
  private val logs = Array.fill(nPartitions)(
    scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])])

  private def logSnapshot(p: Int): IndexedSeq[(Long, Array[Byte])] =
    logs.synchronized { logs(p).toIndexedSeq }

  /** Producible-log append; returns the batch's base offset within the
    * partition. */
  private def append(p: Int, recs: Seq[KafkaWire.WireRecord]): Long =
    logs.synchronized {
      val base = logs(p).size.toLong
      recs.foreach { r =>
        val lsn =
          if (r.key != null && r.key.length == 8)
            java.nio.ByteBuffer.wrap(r.key).getLong
          else -1L
        logs(p) += ((lsn, r.value))
      }
      base
    }

  val sessions = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failure: Option[Throwable] = None
  @volatile private var stopped = false

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  private def body(write: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(out); out.flush(); bos.toByteArray
  }

  /** The drop knob targets the first session that FETCHES (a producer
    * session serves no records, so it must not consume the drop). */
  private val firstFetcherTaken =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def serveSession(sock: Socket, firstSession0: Boolean): Unit = {
    var firstFetcher: Option[Boolean] = None
    def isFirstFetcher: Boolean = {
      if (firstFetcher.isEmpty)
        firstFetcher = Some(firstFetcherTaken.compareAndSet(false, true))
      firstFetcher.get
    }
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))
    var it = feed()
    var pos = 0L
    var served = 0L
    var open = true
    while (open) KafkaWire.readRequest(in) match {
      case None => open = false // client closed
      case Some((h, reqBody)) => h.apiKey match {
        case ApiVersionsKey =>
          val apis = Seq((ApiVersionsKey.toInt, 0, 0),
            (MetadataKey.toInt, 1, 1), (FetchKey.toInt, 4, 4)) ++
            (if (producible) Seq((ProduceKey.toInt, 3, 3)) else Nil)
          writeResponse(out, h.correlationId, body { o =>
            o.writeShort(0) // error_code
            o.writeInt(apis.size)
            apis.foreach { case (k, lo, hi) =>
              o.writeShort(k); o.writeShort(lo); o.writeShort(hi) }
          })
        case ProduceKey if producible =>
          require(h.apiVersion == 3, s"produce v${h.apiVersion} not served")
          val req = new DataInputStream(
            new java.io.ByteArrayInputStream(reqBody))
          KafkaWire.readNullableString(req) // transactional_id
          val acks = req.readShort()
          req.readInt() // timeout_ms
          val nTopics = req.readInt()
          require(nTopics == 1, s"one-topic broker, got $nTopics")
          val reqTopic = readString(req)
          require(reqTopic == topic, s"unknown topic $reqTopic")
          val nParts = req.readInt()
          require(nParts >= 1 && nParts <= nPartitions,
            s"$nPartitions-partition topic, got $nParts partition sets")
          // a real producer batches per partition — one request may
          // carry several partitions' record sets
          val results = (0 until nParts).map { _ =>
            val p = req.readInt()
            require(p >= 0 && p < nPartitions, s"unknown partition $p")
            val setLen = req.readInt()
            val recordSet = new Array[Byte](setLen)
            req.readFully(recordSet)
            val recs = KafkaWire.decodeBatches(recordSet) // CRC-verified
            (p, append(p, recs))
          }
          if (acks != 0) writeResponse(out, h.correlationId, body { o =>
            o.writeInt(1); writeString(o, topic)
            o.writeInt(results.size) // partitions
            results.foreach { case (p, baseOffset) =>
              o.writeInt(p); o.writeShort(0) // index, error
              o.writeLong(baseOffset)
              o.writeLong(-1L) // log_append_time
            }
            o.writeInt(0) // throttle_time
          })
        case MetadataKey =>
          require(h.apiVersion == 1, s"metadata v${h.apiVersion} not served")
          writeResponse(out, h.correlationId, body { o =>
            o.writeInt(1) // brokers
            o.writeInt(0); writeString(o, "127.0.0.1")
            o.writeInt(port); o.writeShort(-1) // rack null
            o.writeInt(0) // controller_id
            o.writeInt(1) // topics
            o.writeShort(0); writeString(o, topic)
            o.writeBoolean(false) // is_internal
            o.writeInt(nPartitions) // partitions
            (0 until nPartitions).foreach { p =>
              o.writeShort(0); o.writeInt(p) // error, index
              o.writeInt(0) // leader
              o.writeInt(1); o.writeInt(0) // replicas [0]
              o.writeInt(1); o.writeInt(0) // isr [0]
            }
          })
        case FetchKey =>
          require(h.apiVersion == 4, s"fetch v${h.apiVersion} not served")
          val req = new DataInputStream(
            new java.io.ByteArrayInputStream(reqBody))
          req.readInt(); req.readInt(); req.readInt() // replica/maxWait/minBytes
          req.readInt(); req.readByte() // maxBytes, isolation
          val nTopics = req.readInt()
          require(nTopics == 1, s"one-topic broker, got $nTopics")
          val reqTopic = readString(req)
          require(reqTopic == topic, s"unknown topic $reqTopic")
          val nParts = req.readInt()
          require(nParts == 1,
            s"one partition per fetch request, got $nParts — the " +
              "partition-parallel consumer issues one fetch per " +
              "partition")
          val partition = req.readInt()
          require(partition >= 0 && partition < nPartitions,
            s"unknown partition $partition")
          val fetchOffset = req.readLong()
          req.readInt() // partition_max_bytes (recordsPerBatch paces)
          val recs = ArrayBuffer.empty[WireRecord]
          var hwm = total
          if (producible) {
            val snap = logSnapshot(partition)
            hwm = snap.size.toLong
            var o = fetchOffset
            while (recs.size < recordsPerBatch && o < snap.size) {
              val (lsn, frame) = snap(o.toInt)
              val key = java.nio.ByteBuffer.allocate(8).putLong(lsn).array()
              recs += WireRecord(o, lsn, key, frame)
              o += 1
            }
          } else {
            if (fetchOffset < pos) { it = feed(); pos = 0L } // re-fetch
            while (pos < fetchOffset && it.hasNext) { it.next(); pos += 1 }
            while (recs.size < recordsPerBatch && it.hasNext) {
              val (lsn, frame) = it.next()
              val key = java.nio.ByteBuffer.allocate(8).putLong(lsn).array()
              recs += WireRecord(pos, lsn, key, frame)
              pos += 1
            }
          }
          served += recs.size
          if (isFirstFetcher && dropAfterRecords > 0 &&
              served > dropAfterRecords) {
            sock.close() // hard mid-stream disconnect, no response
            open = false
          } else {
            val recordSet =
              if (recs.isEmpty) Array.empty[Byte]
              else encodeBatch(recs.toSeq)
            writeResponse(out, h.correlationId, body { o =>
              o.writeInt(0) // throttle_time
              o.writeInt(1); writeString(o, topic)
              o.writeInt(1) // partitions
              o.writeInt(partition); o.writeShort(0) // index, error
              o.writeLong(hwm) // high_watermark
              o.writeLong(hwm) // last_stable_offset
              o.writeInt(0) // aborted txns
              o.writeInt(recordSet.length); o.write(recordSet)
            })
          }
        case other =>
          throw new IllegalArgumentException(s"api key $other not served")
      }
    }
    if (!sock.isClosed) sock.close()
  }

  def start(): LoopbackKafkaBroker = {
    val t = new Thread(() => {
      var accepting = true
      while (accepting && !stopped) {
        val sock =
          try Some(server.accept())
          catch { case _: java.net.SocketException => accepting = false; None }
        sock.foreach { sk =>
          val first = sessions.getAndIncrement() == 0
          try serveSession(sk, first)
          catch {
            case _: java.net.SocketException => () // client side dropped
            case _: java.io.EOFException => () // client side dropped
            case e: Throwable => failure = Some(e)
          }
        }
      }
    }, "loopback-kafka-broker")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = { stopped = true; server.close() }
}
