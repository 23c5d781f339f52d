package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Kafka wire subset (r14 — VERDICT item 4): varint/record-batch
  * codec roundtrips, CRC32C refusal on corruption, truncated-tail
  * tolerance, and the broker+consumer loop end-to-end — exact capture
  * across a hard mid-stream disconnect with small flushes (the
  * replay-dedup path), one frame lake row per served record. */
class KafkaWireSpec extends AnyFunSuite with SparkTestBase {
  import graft.streaming.KafkaWire
  import graft.streaming.KafkaWire.WireRecord

  test("zig-zag varlong roundtrips the boundaries") {
    val vals = Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 127L, 128L,
      300L, -300L, Int.MaxValue.toLong, Int.MinValue.toLong,
      Long.MaxValue, Long.MinValue)
    vals.foreach { v =>
      val buf = java.nio.ByteBuffer.allocate(10)
      KafkaWire.writeVarlong(buf, v)
      assert(buf.position() == KafkaWire.varlongSize(v), s"size of $v")
      buf.flip()
      assert(KafkaWire.readVarlong(buf) == v, s"roundtrip of $v")
    }
  }

  test("record batches roundtrip: offsets, timestamps, keys, null " +
      "values; the CRC refuses a corrupted batch; a truncated tail " +
      "yields only the complete batches") {
    val recs = Seq(
      WireRecord(40L, 1000L, Array[Byte](1, 2), Array[Byte](9)),
      WireRecord(41L, 1007L, null, Array.empty[Byte]),
      WireRecord(42L, 999L, Array[Byte](3), null))
    val batch = KafkaWire.encodeBatch(recs)
    val back = KafkaWire.decodeBatches(batch)
    assert(back.map(_.offset) == Seq(40L, 41L, 42L))
    assert(back.map(_.timestamp) == Seq(1000L, 1007L, 999L))
    assert(back(0).key.toSeq == Seq[Byte](1, 2) &&
      back(1).key == null && back(2).value == null)
    assert(back(1).value.length == 0,
      "empty and null values must stay distinct")
    // corruption: flip one record byte — the CRC refuses
    val corrupt = batch.clone()
    corrupt(corrupt.length - 3) = (corrupt(corrupt.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](
      KafkaWire.decodeBatches(corrupt))
    assert(e.getMessage.contains("CRC"))
    // a truncated tail (maxBytes cut) returns the complete prefix
    val two = batch ++ KafkaWire.encodeBatch(
      Seq(WireRecord(43L, 2000L, null, Array[Byte](7))))
    val cut = two.dropRight(5)
    assert(KafkaWire.decodeBatches(cut).map(_.offset) == Seq(40L, 41L, 42L))
  }

  test("broker + consumer end-to-end: exact capture across a hard " +
      "mid-stream disconnect, small flushes, no duplicates, no losses") {
    import graft.streaming.{KafkaCapture, LoopbackKafkaBroker}
    val n = 1000
    val frames = (0 until n).map(i =>
      ((i + 1) * 10L, s"frame-$i".getBytes("UTF-8")))
    val broker = new LoopbackKafkaBroker("t.wal",
      () => frames.iterator, n.toLong,
      dropAfterRecords = n / 2, recordsPerBatch = 64).start()
    val td = java.nio.file.Files.createTempDirectory("kafkacap").toString
    val slots = new graft.cdc.SlotStore(s"$td/slots")
    slots.setSlot("k")
    val stats = new KafkaCapture("127.0.0.1", broker.port, "t.wal", "k",
      slots, spark, s"$td/lake", flushEvery = 100).run()
    broker.stop()
    assert(broker.failure.isEmpty, s"broker failed: ${broker.failure}")
    assert(stats.reconnects == 1, s"one disconnect expected: $stats")
    assert(stats.watermark == n.toLong)
    val lake = spark.read.parquet(s"$td/lake")
      .select("lsn", "data").collect()
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .sortBy(_._1).toSeq
    assert(lake.size == n, "no duplicates, no losses")
    assert(lake == frames.map { case (l, b) => (l, new String(b, "UTF-8")) },
      "every frame exactly once, content intact")
    assert(stats.flushes >= 10, "small flushes must have run (dedup path)")
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("produce → consume roundtrip: records shipped over Produce v3 " +
      "land in offset order, survive the consume-side disconnect, and " +
      "arrive exactly once") {
    import graft.streaming.{KafkaCapture, KafkaProduce, LoopbackKafkaBroker}
    val n = 777
    val broker = new LoopbackKafkaBroker("rt.wal",
      () => Iterator.empty, 0L,
      dropAfterRecords = n / 3, recordsPerBatch = 50,
      producible = true).start()
    val frames = (0 until n).map(i =>
      ((i + 1) * 3L, s"rt-$i".getBytes("UTF-8")))
    val shipped = new KafkaProduce("127.0.0.1", broker.port, "rt.wal",
      recordsPerBatch = 100).run(frames.iterator)
    assert(shipped == n.toLong)
    val td = java.nio.file.Files.createTempDirectory("kafkart").toString
    val slots = new graft.cdc.SlotStore(s"$td/slots")
    slots.setSlot("rt")
    val stats = new KafkaCapture("127.0.0.1", broker.port, "rt.wal", "rt",
      slots, spark, s"$td/lake", flushEvery = 64).run()
    broker.stop()
    assert(broker.failure.isEmpty, s"broker failed: ${broker.failure}")
    assert(stats.reconnects >= 1, "the consume-side disconnect must fire")
    val lake = spark.read.parquet(s"$td/lake")
      .select("lsn", "data").collect()
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .sortBy(_._1).toSeq
    assert(lake == frames.map { case (l, b) => (l, new String(b, "UTF-8")) },
      "the produced sequence must arrive exactly once, in content")
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("the consumer is loud on a topic/partition drift and on a " +
      "broker that cannot serve Fetch v4") {
    import graft.streaming.{KafkaCapture, LoopbackKafkaBroker}
    val broker = new LoopbackKafkaBroker("right.topic",
      () => Iterator((1L, Array[Byte](1))), 1L,
      dropAfterRecords = 0).start()
    val td = java.nio.file.Files.createTempDirectory("kafkacap2").toString
    val slots = new graft.cdc.SlotStore(s"$td/slots")
    slots.setSlot("k")
    // requesting a foreign topic: the broker refuses (its require
    // throws server-side and the connection dies) — the consumer gives
    // up loudly after its reconnect budget, never hangs
    val e = intercept[Exception] {
      new KafkaCapture("127.0.0.1", broker.port, "wrong.topic", "k",
        slots, spark, s"$td/lake", flushEvery = 10,
        maxReconnects = 1).run()
    }
    assert(e.getMessage.nonEmpty)
    broker.stop()
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("multi-partition transport: partition-routed produce, " +
      "round-robin partition-parallel consume with PER-PARTITION " +
      "durable watermarks, one partition lagging 10×, a mid-stream " +
      "disconnect — every partition lands exactly once, the group ack " +
      "is the minimum watermark") {
    import graft.streaming.{KafkaCapture, KafkaProduce, LoopbackKafkaBroker}
    // skewed partition sizes: p2 carries 10× — the lagging partition
    val sizes = Map(0 -> 120, 1 -> 90, 2 -> 1200)
    val frames = sizes.toSeq.sortBy(_._1).flatMap { case (p, n) =>
      (0 until n).map(i => (p, (i + 1).toLong, s"p$p-$i".getBytes("UTF-8")))
    }
    val broker = new LoopbackKafkaBroker("mp.wal",
      () => Iterator.empty, 0L,
      dropAfterRecords = 200, recordsPerBatch = 64,
      producible = true, nPartitions = 3).start()
    val shipped = new KafkaProduce("127.0.0.1", broker.port, "mp.wal",
      recordsPerBatch = 50).runPartitioned(frames.iterator)
    assert(shipped == sizes.values.sum.toLong)
    val td = java.nio.file.Files.createTempDirectory("kafkamp").toString
    val slots = new graft.cdc.SlotStore(s"$td/slots")
    (0 to 2).foreach(p => slots.setSlot(s"mp.p$p"))
    val stats = new KafkaCapture("127.0.0.1", broker.port, "mp.wal", "mp",
      slots, spark, s"$td/lake", flushEvery = 64,
      partitions = Seq(0, 1, 2)).run()
    broker.stop()
    assert(broker.failure.isEmpty, s"broker failed: ${broker.failure}")
    assert(stats.reconnects >= 1, "the mid-stream disconnect must fire")
    assert(stats.perPartition == sizes.map { case (p, n) => p -> n.toLong },
      s"per-partition watermarks must equal the shipped counts: $stats")
    assert(stats.watermark == 90L,
      "the group ack is the MINIMUM per-partition watermark")
    val lake = spark.read.parquet(s"$td/lake")
      .select("partition", "lsn", "data").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(lake == frames.map { case (p, l, b) =>
      (p, l, new String(b, "UTF-8")) }.sortBy(t => (t._1, t._2)),
      "every partition's records exactly once, content intact")
    graft.operators.Checkpointing.deleteRecursively(td)
  }
}
