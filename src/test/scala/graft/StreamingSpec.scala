package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AttrEvent, Attribution, CdcStream, Change, FunnelEvent, SegmentKey, SketchRow, Snapshot, StageReach, TransEvent, Transition}

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("gate lint: no driver-memory sink or O(emissions) collect in any gate path") {
    // the r8 VERDICT's harness defect, pinned closed: a `format("memory")`
    // sink holds the WHOLE emission set on the driver (~6 M journey edges
    // at sf1 for q_transitions_stream), so no production source may use
    // one — StreamGate drains through a per-run parquet file sink
    // (memory-sink streams remain fine in TESTS, where inputs are tiny).
    // And no gate extractor may collect() the sink: the two exceptions are
    // bounded by construction and named here so a new one is a loud diff.
    import scala.jdk.CollectionConverters._
    val srcMain = java.nio.file.Paths.get("src/main/scala")
    val walk = java.nio.file.Files.walk(srcMain)
    val sources = try walk.iterator().asScala
      .filter(_.toString.endsWith(".scala")).toVector finally walk.close()
    assert(sources.nonEmpty)
    for (p <- sources) {
      val text = java.nio.file.Files.readString(p)
      assert(!text.contains("format(\"memory\")"),
        s"$p uses a driver-memory sink — gates must drain to the file sink")
      // every StreamGate.run extractor block: no .collect() within the
      // 15 lines following the call, except the NAMED bounded gates —
      // keyed on the sinkPrefix in the call window, not the file, so a
      // collect sneaking into q_zscore_stream or cdc_stream_snapshot
      // (same files as the allowed gates) still fails
      // (kmv_gate: O(segments × batches × k); ivm_gate: O(tables);
      //  hh_gate: O(segments × batches × capacity) MG summaries)
      val lines = text.linesIterator.toVector
      val allowedGates = Seq("\"kmv_gate\"", "\"ivm_gate\"", "\"hh_gate\"")
      for (i <- lines.indices if lines(i).contains("StreamGate.run")) {
        val window = lines.slice(i, i + 15).mkString("\n")
        if (window.contains(".collect()"))
          assert(allowedGates.exists(window.contains),
            s"$p line ${i + 1}: gate extractor collects the sink — " +
              "only the named bounded gates (kmv_gate, ivm_gate, hh_gate) may")
      }
    }
    // and the shared gate driver is the file-sink drain
    val gate = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/streaming/StreamGate.scala"))
    assert(gate.contains("foreachBatch") && gate.contains(".parquet(sinkDir)"),
      "StreamGate.run must drain micro-batches to a parquet file sink")
  }

  test("streaming latestSnapshot: upserts across micro-batches, LSN wins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.latestSnapshot(input.toDS())
      .writeStream.format("memory").queryName("snap").outputMode(OutputMode.Update)
      .start()
    try {
      // batch 1: two keys insert
      input.addData(
        Change(1, "users", "INSERT", 1, 100, 10.0),
        Change(2, "users", "INSERT", 2, 200, 20.0))
      q.processAllAvailable()
      // batch 2: update key 1, delete key 2, plus an out-of-order stale
      // change for key 1 that must lose to the state's higher LSN
      input.addData(
        Change(4, "users", "UPDATE", 1, 400, 11.0),
        Change(5, "users", "DELETE", 2, 500, 0.0))
      q.processAllAvailable()
      input.addData(Change(3, "users", "UPDATE", 1, 300, 99.0)) // stale
      q.processAllAvailable()

      val rows = spark.table("snap").as[Snapshot].collect()
      val lastPerKey = rows.groupBy(_.pk).map { case (k, v) => k -> v.maxBy(_.lsn) }
      assert(lastPerKey(1L) == Snapshot("users", 1L, 4L, "UPDATE", 11.0, false))
      assert(lastPerKey(2L) == Snapshot("users", 2L, 5L, "DELETE", 0.0, true))
    } finally q.stop()
  }

  test("streaming latestSnapshot keys on (table, pk): same pk across tables stays distinct") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.latestSnapshot(input.toDS())
      .writeStream.format("memory").queryName("snapmt").outputMode(OutputMode.Update)
      .start()
    try {
      input.addData(
        Change(10, "users", "INSERT", 5, 100, 1.0),
        Change(12, "accounts", "INSERT", 5, 200, 2.0),
        // a DELETE on accounts.5 must not tombstone users.5
        Change(14, "accounts", "DELETE", 5, 300, 0.0))
      q.processAllAvailable()
      val rows = spark.table("snapmt").as[Snapshot].collect()
        .groupBy(s => (s.table, s.pk)).map { case (k, v) => k -> v.maxBy(_.lsn) }
      assert(rows(("users", 5L)) == Snapshot("users", 5L, 10L, "INSERT", 1.0, false))
      assert(rows(("accounts", 5L)).tombstoned)
    } finally q.stop()
  }

  test("changelogRates: windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val rates = CdcStream.changelogRates(input.toDS().toDF(), "1 minute", "2 minutes")
    val q = rates.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Update).start()
    try {
      val t0 = 1700000000000000L // epoch micros
      input.addData(
        Change(1, "users", "INSERT", 1, t0, 1.0),
        Change(2, "users", "INSERT", 2, t0 + 1000000, 1.0),
        Change(3, "users", "DELETE", 1, t0 + 90000000, 1.0)) // next window
      q.processAllAvailable()
      val rows = spark.table("rates")
        .selectExpr("tableName", "op", "n_events").as[(String, String, Long)]
        .collect().toSet
      assert(rows.contains(("users", "INSERT", 2L)))
      assert(rows.contains(("users", "DELETE", 1L)))
    } finally q.stop()
  }

  test("append-mode watermark boundary: window end == watermark emits, later window held") {
    // pins the finalization rule the q_tumbling_stream oracle replays:
    // wm = max event-time (ms precision) - delay; a window emits iff
    // end <= wm — INCLUSIVE at equality (probed on Spark 4.1; if an
    // upgrade flips the boundary this fails before the gate does)
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600000000L
    val input = MemoryStream[Long] // event-time micros
    val agg = input.toDS().toDF("ts_us")
      .select(timestamp_micros(col("ts_us")).as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wmb")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(100L, hourUs + 5L)
      q.processAllAvailable()
      // max ts = 2h10m exactly → wm lands exactly ON window [1h,2h)'s end
      input.addData(2 * hourUs + 600000000L)
      q.processAllAvailable()
      val rows = spark.table("wmb").as[(Long, Long)].collect().toSet
      assert(rows === Set((0L, 1L), (hourUs, 1L)),
        s"boundary drifted: $rows") // window [2h,3h) held — end > wm
    } finally q.stop()
  }

  test("late-data boundary: a row whose window end == watermark is dropped") {
    // pins the DROP rule the q_late_drop_stream oracle replays: a late row
    // is discarded iff its window's end <= the batch's LATE-EVENTS
    // watermark (the previous batch's eviction watermark — Spark's
    // two-watermark design; here the no-data finalization batch between
    // the two addData cycles brings both to 2h), with the same inclusive
    // boundary as emission (an emitted window's state is gone, so a row
    // that would land in it at equality must drop). Back-to-back DATA
    // batches see the one-batch lag instead — that path is what the
    // q_late_drop_stream gate replays over the 4-chunk feed.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600000000L
    val input = MemoryStream[Long]
    val agg = input.toDS().toDF("ts_us")
      .select(timestamp_micros(col("ts_us")).as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: wm becomes exactly 2h; windows [0,1h) and [1h,2h) emit
      input.addData(100L, hourUs + 5L, 2 * hourUs + 600000000L)
      q.processAllAvailable()
      // batch 1: late rows — window [1h,2h) has end == wm (dropped);
      // window [2h,3h) has end > wm (kept, joins the open group)
      input.addData(hourUs + 7L, 2 * hourUs + 7L)
      q.processAllAvailable()
      // advance wm past 3h so [2h,3h) finalizes and shows its count
      input.addData(3 * hourUs + 600000000L)
      q.processAllAvailable()
      val rows = spark.table("late").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(rows(hourUs) == 1L, s"equality row must DROP: $rows")
      assert(rows(2 * hourUs) == 2L, s"open-window late row must KEEP: $rows")
    } finally q.stop()
  }

  test("dedupWithinWatermark drops replayed LSNs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.dedupWithinWatermark(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      input.addData(
        Change(1, "users", "INSERT", 1, t0, 1.0),
        Change(1, "users", "INSERT", 1, t0, 1.0), // dup in-batch
        Change(2, "users", "UPDATE", 1, t0 + 1000, 2.0))
      q.processAllAvailable()
      input.addData(Change(2, "users", "UPDATE", 1, t0 + 1000, 2.0)) // replay
      q.processAllAvailable()
      val lsns = spark.table("dedup").select("lsn").as[Long].collect().toSeq.sorted
      assert(lsns == Seq(1L, 2L))
    } finally q.stop()
  }

  test("dedupWithinWatermark horizon: a duplicate BEYOND the delay re-emits (state evicted)") {
    // the honest boundary of the q_exactly_once_stream contract: inside
    // the watermark horizon dedup is exact; once the watermark passes a
    // key's event time + delay its state is evictable, and a replay
    // arriving after that is indistinguishable from a new event — the
    // pipeline degrades to at-least-once exactly at the horizon it
    // declared. Production sets the delay to the real redelivery window.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.dedupWithinWatermark(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_hz")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      input.addData(Change(1, "users", "INSERT", 1, t0, 1.0))
      q.processAllAvailable()
      // advance event time far past t0 + 10 min → lsn 1's state evicts
      input.addData(Change(2, "users", "UPDATE", 2, t0 + 3600000000L, 2.0))
      q.processAllAvailable()
      // replay of lsn 1 BEYOND the horizon: re-emitted, not deduped
      input.addData(Change(1, "users", "INSERT", 1, t0 + 3600000000L + 1, 1.0))
      q.processAllAvailable()
      val lsns = spark.table("dedup_hz").select("lsn").as[Long].collect().toSeq.sorted
      assert(lsns == Seq(1L, 1L, 2L), s"got $lsns")
    } finally q.stop()
  }

  test("streaming corpus cleaning: quality gate + content dedup on a doc stream") {
    // the batch pipeline_clean_corpus shape, driven as a stream: the same
    // column expressions run unchanged; dedup keys on the content hash
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)] // doc_id, text, event_us
    val good = "the data is in the table and it is a good long row of words " * 3
    val df = input.toDS().toDF("doc_id", "text", "event_us")
      .withColumn("ts_t", org.apache.spark.sql.functions.timestamp_micros($"event_us"))
      .withWatermark("ts_t", "10 minutes")
      .withColumn("quality_score", graft.functions.Text.qualityScore($"text"))
      .filter($"quality_score" >= 0.5)
      .withColumn("content_hash", org.apache.spark.sql.functions.md5($"text"))
      .dropDuplicatesWithinWatermark("content_hash")
    val q = df.writeStream.format("memory").queryName("cleandocs")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      input.addData((1L, good, t0), (2L, "x!!", t0 + 1), (3L, good, t0 + 2))
      q.processAllAvailable()
      input.addData((4L, good, t0 + 3), (5L, good + "different tail", t0 + 4))
      q.processAllAvailable()
      val ids = spark.table("cleandocs").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 5L)) // 2 fails quality; 3,4 are dup content
    } finally q.stop()
  }

  test("streaming near-dup: new docs match history across micro-batches, never re-pair it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val matches = graft.streaming.DedupStream
      .nearDupMatches(spark, input.toDS().toDF("doc_id", "text"))
    val q = matches.writeStream.format("memory").queryName("neardup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      // batch 1: two unrelated docs + one near-dup pair INSIDE the batch
      input.addData((1L, base), (2L, "completely different content here entirely"),
        (3L, base + " extra"))
      q.processAllAvailable()
      val m1 = spark.table("neardup").select("doc_a", "doc_b")
        .distinct().as[(Long, Long)].collect().toSet
      assert(m1 == Set((1L, 3L)), s"got $m1")
      // batch 2: a new near-dup of doc 1 — must match HISTORY (1 and 3),
      // and the historical pair (1,3) must NOT be re-emitted
      val before = spark.table("neardup").count()
      input.addData((4L, base + " more"))
      q.processAllAvailable()
      val m2 = spark.table("neardup").select("doc_a", "doc_b")
        .distinct().as[(Long, Long)].collect().toSet
      assert(m2 == Set((1L, 3L), (1L, 4L), (3L, 4L)), s"got $m2")
      // every new emission involves doc 4 (no history re-pairing)
      val newRows = spark.table("neardup").as[graft.streaming.DedupStream.Match]
        .collect().drop(before.toInt)
      assert(newRows.nonEmpty && newRows.forall(m => m.doc_a == 4L || m.doc_b == 4L))
      // estimates are the batch family's values: pairs of near-identical
      // docs agree on most slots
      assert(newRows.forall(m => m.est_jaccard >= 0.5 && m.est_jaccard <= 1.0))
      // at-least-once redelivery: replaying doc 1 must add NO state entry
      // and emit NO new matches (its pairs were emitted at first arrival)
      val beforeReplay = spark.table("neardup").count()
      input.addData((1L, base))
      q.processAllAvailable()
      assert(spark.table("neardup").count() == beforeReplay,
        "redelivered doc re-emitted matches")
    } finally q.stop()
  }

  test("streaming near-dup bucketTtl evicts cold buckets; default retains history") {
    // with a 1 ms TTL, a bucket with no arrivals for a full TTL window is
    // evicted: a later near-dup of the evicted member finds an EMPTY bucket
    // (no match — the documented bounded-state trade), then matches
    // against the post-eviction history normally. NOTE the funnel-TTL
    // caveat applies: with ProcessingTimeTimeout the engine always
    // schedules another batch, so processAllAvailable never returns —
    // the sink is POLLED instead.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.OutputMode
    def matches = spark.table("neardupttl")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    def eventually(what: String)(f: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < end && !f) Thread.sleep(50)
      assert(f, s"condition not reached: $what; got $matches")
    }
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream
      .nearDupMatches(spark, input.toDS().toDF("doc_id", "text"),
        bucketTtlMs = Some(1L))
      .writeStream.format("memory").queryName("neardupttl")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: a near-dup pair lands in shared buckets and matches
      input.addData((1L, base), (2L, base + " extra"))
      eventually("in-flight pair matches before any eviction")(
        matches.contains((1L, 2L)))
      // well after the TTL, the buckets go cold and are evicted by a
      // timeout batch (same generous margin as the funnel TTL spec)
      Thread.sleep(2000)
      // docs 3+4 are near-dups of 1 and 2 — but that bucket state is gone,
      // so NO (1,3)/(2,3) match can appear; 3 and 4 arrive in ONE batch
      // (in-batch pairing is TTL-immune) and match each other, proving the
      // stream is still live after the eviction
      input.addData((3L, base + " more"), (4L, base + " more still"))
      eventually("evicted history silent; post-eviction pair matches")(
        matches.contains((3L, 4L)))
      assert(!matches.contains((1L, 3L)) && !matches.contains((2L, 3L)),
        s"matches against evicted bucket members must not appear; got $matches")
    } finally q.stop()
  }

  test("intervalJoin: stream-stream join matches only within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Change]
    val buys = MemoryStream[Change]
    val q = CdcStream.intervalJoin(clicks.toDS(), buys.toDS(), 60000000L, "0 seconds")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      clicks.addData(Change(1, "users", "UPDATE", 1, t0, 1.0))
      buys.addData(
        Change(10, "users", "UPDATE", 1, t0 + 30000000L, 5.0),  // within 60s
        Change(11, "users", "UPDATE", 1, t0 + 90000000L, 6.0),  // outside
        Change(12, "users", "UPDATE", 2, t0 + 10000000L, 7.0))  // other key
      q.processAllAvailable()
      val got = spark.table("ssjoin").select("l_lsn", "r_lsn")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("intervalJoin honors sub-second windows (no whole-second truncation)") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[Change]
    val b = MemoryStream[Change]
    val q = CdcStream.intervalJoin(a.toDS(), b.toDS(), 500000L, "0 seconds") // 0.5s
      .writeStream.format("memory").queryName("subsec")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      a.addData(Change(1, "users", "UPDATE", 1, t0, 1.0))
      b.addData(
        Change(10, "users", "UPDATE", 1, t0 + 300000L, 2.0), // 0.3s → in
        Change(11, "users", "UPDATE", 1, t0 + 700000L, 3.0)) // 0.7s → out
      q.processAllAvailable()
      val got = spark.table("subsec").select("r_lsn").as[Long].collect().toSet
      assert(got == Set(10L))
    } finally q.stop()
  }

  test("scd2Stream drops cross-batch replays and late events (no overlap/dup)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2replay")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Change(1, "users", "INSERT", 1, 100, 10.0),
        Change(3, "users", "UPDATE", 1, 300, 12.0))
      q.processAllAvailable()
      // replay of lsn 1 and a late lsn 2 — both must be ignored
      input.addData(
        Change(1, "users", "INSERT", 1, 100, 10.0),
        Change(2, "users", "UPDATE", 1, 200, 11.0))
      q.processAllAvailable()
      val got = spark.table("scd2replay").as[graft.streaming.Scd2Closed].collect().toSeq
      assert(got == Seq(graft.streaming.Scd2Closed("users", 1L, 10.0, 100L, 300L, 1L)))
    } finally q.stop()
  }

  test("sessionWindows: sessions close on gap and emit when watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.sessionWindows(input.toDS(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      input.addData(
        Change(1, "users", "UPDATE", 1, t0, 1.0),
        Change(2, "users", "UPDATE", 1, t0 + 30000000L, 2.0),  // same session
        Change(3, "users", "UPDATE", 1, t0 + 600000000L, 3.0)) // new session
      q.processAllAvailable()
      // push the watermark far ahead so both sessions for key 1 close
      input.addData(Change(4, "users", "UPDATE", 2, t0 + 7200000000L, 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .filter($"pk" === 1).orderBy("session_start_us")
        .selectExpr("n_events", "sum_value").as[(Long, Double)].collect().toSeq
      assert(got == Seq((2L, 3.0), (1L, 3.0)))
    } finally q.stop()
  }

  test("session_window boundaries: equal-gap event merges, equal-watermark session emits") {
    // the two boundary rules the q_session_window_stream oracle pins:
    // (1) an event at EXACTLY previous-session-end merges (split iff
    // gap > 30 min — the batch q_sessionize rule), so end = last + gap;
    // (2) a session whose end EQUALS the eviction watermark emits.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val agg = input.toDS().toDF("u", "ts_us")
      .select(col("u"), timestamp_micros(col("ts_us")).as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(col("u"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), unix_micros(col("w.start")).as("st"),
        unix_micros(col("w.end")).as("en"), col("n"))
    val q = agg.writeStream.format("memory").queryName("swb")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000000L
      input.addData((1L, t0), (1L, t0 + 1800000000L)) // exactly at prev end
      q.processAllAvailable()
      // wm after this batch = (t0 + 3600s + 600s) - 600s = session end
      input.addData((2L, t0 + 3600000000L + 600000000L))
      q.processAllAvailable()
      val got = spark.table("swb").as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq((1L, t0, t0 + 3600000000L, 2L)),
        s"one merged session, emitted at wm == end: $got")
    } finally q.stop()
  }

  test("materializeSnapshot: change stream → queryable parquet table") {
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("snapdir").toString + "/t"
    val ck = java.nio.file.Files.createTempDirectory("snapck").toString
    val input = MemoryStream[Change]
    val q = CdcStream.materializeSnapshot(input.toDS(), snap, ck)
    try {
      input.addData(
        Change(1, "users", "INSERT", 1, 100, 10.0),
        Change(2, "users", "INSERT", 2, 200, 20.0))
      q.processAllAvailable()
      input.addData(
        Change(3, "users", "UPDATE", 1, 300, 11.0),
        Change(4, "users", "DELETE", 2, 400, 0.0),
        Change(5, "users", "INSERT", 3, 500, 30.0))
      q.processAllAvailable()
      val got = CdcStream.readSnapshot(spark, snap).collect()
        .map(s => s.pk -> s.value).toMap
      assert(got == Map(1L -> 11.0, 3L -> 30.0)) // 2 hidden by tombstone
      // the tombstone row itself is RETAINED in storage (replay safety)
      val stored = spark.read
        .parquet(CdcStream.currentSnapshotDir(spark, snap)).as[Snapshot].collect()
      assert(stored.exists(s => s.pk == 2L && s.tombstoned))
      // version-and-pointer layout: a bounded retention window of version
      // dirs survives each swap (a reader mid-scan on the previous version
      // must not fail on a deleted dir), and the pointer names the newest
      input.addData(Change(6, "users", "UPDATE", 3, 600, 31.0))
      q.processAllAvailable()
      val vdirs = new java.io.File(snap).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .map(_.getName).sortBy(_.drop(1).toLong)
      assert(vdirs.length == 2, // RetainedVersions
        s"expected a 2-version retention window, got ${vdirs.mkString(", ")}")
      assert(CdcStream.currentSnapshotDir(spark, snap).endsWith("/" + vdirs.last))
    } finally q.stop()
  }

  test("snapshot pointer CAS: two writers racing from the same base — exactly one wins") {
    // lost-update impossibility (r11): both writers merged from v0, both
    // wrote a candidate version, both CAS from expected v0 concurrently.
    // The lock serializes the check-and-swap; whoever runs second sees the
    // advanced pointer and LOSES — its merge (which never saw the winner's
    // changes) cannot become visible. A subsequent writer that re-reads
    // the new current succeeds; a stale-expected CAS always fails.
    val base = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("snapcas").toString + "/t")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkVersion(name: String): Unit = {
      fs.mkdirs(new org.apache.hadoop.fs.Path(base, name))
      ()
    }
    mkVersion("v0")
    assert(CdcStream.swapPointerIfCurrent(spark, fs, base, None, "v0"),
      "initial swap from no-snapshot must succeed")
    mkVersion("v1a"); mkVersion("v1b")
    val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val threads = Seq("v1a", "v1b").map { v =>
      new Thread(() => results.put(v,
        CdcStream.swapPointerIfCurrent(spark, fs, base, Some("v0"), v)))
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val wins = Seq("v1a", "v1b").filter(results.get(_))
    assert(wins.size == 1, s"exactly one racing writer must win, got $results")
    assert(CdcStream.currentSnapshotDir(spark, base.toString).endsWith("/" + wins.head),
      "the pointer must name the winner")
    // the loser retries from the NEW current and succeeds; a stale CAS fails
    val loser = Seq("v1a", "v1b").filterNot(_ == wins.head).head
    assert(!CdcStream.swapPointerIfCurrent(spark, fs, base, Some("v0"), loser),
      "a stale-expected CAS must keep failing")
    mkVersion("v2")
    assert(CdcStream.swapPointerIfCurrent(spark, fs, base, Some(wins.head), "v2"))
    assert(CdcStream.currentSnapshotDir(spark, base.toString).endsWith("/v2"))
    // the lock never lingers after a completed CAS
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "_pointer.lock")))
    // lease recovery: a crashed writer's orphan lock (old mtime) is broken
    // once, loudly, instead of permanently failing every later batch
    val lock = new org.apache.hadoop.fs.Path(base, "_pointer.lock")
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis - 600000L, -1) // 10 min old
    mkVersion("v3")
    assert(CdcStream.swapPointerIfCurrent(spark, fs, base, Some("v2"), "v3"),
      "a stale (crashed-writer) lock must be broken and the CAS proceed")
    assert(CdcStream.currentSnapshotDir(spark, base.toString).endsWith("/v3"))
    assert(!fs.exists(lock))
    // breaking is SERIALIZED through a breaker tombstone (r12): a crash
    // mid-break orphans BOTH files — the breaker gets the same lease rule,
    // so the next writer still recovers, and neither file lingers after
    val breaker = new org.apache.hadoop.fs.Path(base, "_pointer.lock.breaker")
    fs.create(lock, true).close()
    fs.create(breaker, true).close()
    fs.setTimes(lock, System.currentTimeMillis - 600000L, -1)
    fs.setTimes(breaker, System.currentTimeMillis - 600000L, -1)
    mkVersion("v4")
    assert(CdcStream.swapPointerIfCurrent(spark, fs, base, Some("v3"), "v4"),
      "an orphaned breaker must be lease-broken like the lock itself")
    assert(CdcStream.currentSnapshotDir(spark, base.toString).endsWith("/v4"))
    assert(!fs.exists(lock) && !fs.exists(breaker))
  }

  test("scd2Stream emits each closed interval exactly once, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2s")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Change(1, "users", "INSERT", 1, 100, 10.0),
        Change(2, "users", "UPDATE", 1, 200, 11.0))
      q.processAllAvailable()
      input.addData(Change(3, "users", "UPDATE", 1, 300, 12.0))
      q.processAllAvailable()
      val got = spark.table("scd2s")
        .orderBy("openedByLsn")
        .as[graft.streaming.Scd2Closed].collect().toSeq
      assert(got == Seq(
        graft.streaming.Scd2Closed("users", 1L, 10.0, 100L, 200L, 1L),
        graft.streaming.Scd2Closed("users", 1L, 11.0, 200L, 300L, 2L)))
    } finally q.stop()
  }

  test("checkpoint recovery: a restarted query resumes offsets and state result") {
    val src = java.nio.file.Files.createTempDirectory("ckpsrc").toString
    val snap = java.nio.file.Files.createTempDirectory("ckpsnap").toString + "/t"
    val ck = java.nio.file.Files.createTempDirectory("ckpck").toString
    Seq(Change(1, "users", "INSERT", 1, 100, 1.0)).toDS()
      .write.mode("append").parquet(src)
    val q1 = CdcStream.materializeSnapshot(CdcStream.fileSource(spark, src), snap, ck)
    try { q1.processAllAvailable() } finally q1.stop()
    // second incarnation, same checkpoint: must pick up only the new batch
    Seq(Change(2, "users", "UPDATE", 1, 200, 2.0)).toDS()
      .write.mode("append").parquet(src)
    val q2 = CdcStream.materializeSnapshot(CdcStream.fileSource(spark, src), snap, ck)
    try {
      q2.processAllAvailable()
      val got = CdcStream.readSnapshot(spark, snap).collect().toSeq
      assert(got == Seq(Snapshot("users", 1L, 2L, "UPDATE", 2.0, false)))
      // offsets resumed: the restarted run processed exactly the delta batch
      assert(q2.recentProgress.map(_.numInputRows).sum == 1L)
    } finally q2.stop()
  }

  test("end-to-end: pgoutput frame drops → streaming decode → live snapshot") {
    import graft.cdc.{PgColumn, PgOutput, PgTuple, RelationMsg, InsertMsg, UpdateMsg, DeleteMsg}
    import graft.streaming.PgOutputStream
    val framesDir = java.nio.file.Files.createTempDirectory("e2eframes").toString
    val snap = java.nio.file.Files.createTempDirectory("e2esnap").toString + "/t"
    val ck = java.nio.file.Files.createTempDirectory("e2eck").toString
    val rel = RelationMsg(500, "public", "users", 'd'.toByte,
      Seq("pk", "ts_us", "value", "props").map(c => PgColumn(0, c, 25, -1)))
    def tup(pk: Long, ts: Long, v: Double) =
      PgTuple(Seq(Some(pk.toString), Some(ts.toString), Some(v.toString), Some("{}")))
    // batch 1: register the relation, insert two rows
    Seq(
      1L -> PgOutput.encode(rel),
      2L -> PgOutput.encode(InsertMsg(500, tup(1, 100, 10.0))),
      3L -> PgOutput.encode(InsertMsg(500, tup(2, 200, 20.0))))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)
    // wire: frame drops → stateful decode → canonical feed → snapshot merge
    val changes = PgOutput.toCanonicalFeed(
        PgOutputStream.decodeStream(spark,
          PgOutputStream.frameSource(spark, framesDir)).toDF())
      .select($"lsn", $"table_name".as("tableName"), $"op", $"pk",
        $"ts_us".as("tsUs"), $"value").as[Change]
    val q = CdcStream.materializeSnapshot(changes, snap, ck)
    try {
      q.processAllAvailable()
      assert(CdcStream.readSnapshot(spark, snap).collect()
        .map(s => s.pk -> s.value).toMap == Map(1L -> 10.0, 2L -> 20.0))
      // batch 2: update pk 1, delete pk 2 — decoded against the registry
      // checkpointed from batch 1
      Seq(
        4L -> PgOutput.encode(UpdateMsg(500, None, None, tup(1, 300, 11.0))),
        5L -> PgOutput.encode(DeleteMsg(500, 'O'.toByte, tup(2, 400, 0.0))))
        .toDF("lsn", "data").write.mode("append").parquet(framesDir)
      q.processAllAvailable()
      assert(CdcStream.readSnapshot(spark, snap).collect()
        .map(s => s.pk -> s.value).toMap == Map(1L -> 11.0))
    } finally q.stop()
  }

  test("capture loop acks decoded LSNs into the SlotStore; restart resumes, no loss/dup") {
    // The keepAlive analog (postrack.go:98-117): stream decode → handler →
    // per-batch ack of the max decoded LSN into the durable slot store.
    // Then the hard part: kill the query, LOSE the Spark checkpoint, and
    // restart from confirmedFlushLsn + 1 — the reference's
    // StartReplication(lsn+1) contract. Nothing may be lost or re-handled.
    import graft.cdc.{PgColumn, PgOutput, PgTuple, RelationMsg, InsertMsg, UpdateMsg, SlotStore}
    import graft.streaming.PgOutputStream
    val framesDir = java.nio.file.Files.createTempDirectory("capframes").toString
    val slotsDir = java.nio.file.Files.createTempDirectory("capslots").toString
    val ck1 = java.nio.file.Files.createTempDirectory("capck1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("capck2").toString
    val rel = RelationMsg(600, "public", "users", 'd'.toByte,
      Seq("pk", "v").map(c => PgColumn(0, c, 25, -1)))
    def ins(pk: Long, v: String) = InsertMsg(600, PgTuple(Seq(Some(pk.toString), Some(v))))
    val slots = new SlotStore(slotsDir)
    slots.setSlot("s1")
    val handled = scala.collection.mutable.ArrayBuffer[Long]()
    Seq(
      1L -> PgOutput.encode(rel),
      2L -> PgOutput.encode(ins(1, "a")),
      3L -> PgOutput.encode(ins(2, "b")))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)
    val q1 = PgOutputStream.captureTo(
      PgOutputStream.decodeStream(spark,
        PgOutputStream.resumeFrames(spark, framesDir, slots, "s1")),
      ck1, slots, "s1") { b => handled ++= b.collect().map(_.lsn) }
    try q1.processAllAvailable() finally q1.stop()
    assert(handled.sorted == Seq(2L, 3L))
    assert(slots.confirmedFlushLsn("s1") == 3L)

    // ---- restart: fresh SlotStore over the same dir (process died), fresh
    // checkpoint (worst case). The capture side re-sends the relation frame
    // on reconnect — pgoutput re-sends Relation per session — at a new LSN,
    // and REPLAYS an already-acked frame (lsn 2): resume must filter it.
    val slots2 = new SlotStore(slotsDir)
    assert(slots2.currentSlot.contains("s1"), "selected slot must survive restart")
    assert(slots2.confirmedFlushLsn("s1") == 3L)
    Seq(
      2L -> PgOutput.encode(ins(1, "a")), // replay below the watermark
      10L -> PgOutput.encode(rel), // reconnect re-send
      11L -> PgOutput.encode(UpdateMsg(600, None, None,
        PgTuple(Seq(Some("1"), Some("a2"))))))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)
    val q2 = PgOutputStream.captureTo(
      PgOutputStream.decodeStream(spark,
        PgOutputStream.resumeFrames(spark, framesDir, slots2, "s1")),
      ck2, slots2, "s1") { b => handled ++= b.collect().map(_.lsn) }
    try q2.processAllAvailable() finally q2.stop()
    // exactly the un-acked event arrived; the replayed lsn 2 did not re-fire
    assert(handled.sorted == Seq(2L, 3L, 11L))
    assert(slots2.confirmedFlushLsn("s1") == 11L)
  }

  test("full bootstrap: snapshot seed + slot resume + mid-stream schema change + restart") {
    // The complete consumer lifecycle the reference enables
    // (postrack.go:285-309 StartReplication(lsn+1) + snapshot bootstrap):
    //   1. snapshot the table (graft.sources.Jdbc.snapshot's output shape —
    //      a batch DataFrame of rows at capture time; no database ships in
    //      this sandbox, so the stand-in IS that DataFrame),
    //   2. note the slot's confirmed LSN at snapshot time,
    //   3. stream-apply the decoded pgoutput feed strictly after it —
    //      across a replayed frame, a reconnect Relation re-send, a
    //      MID-STREAM SCHEMA CHANGE (new column), a kill with a LOST
    //      checkpoint, and a restart —
    // and the result must equal a batch replay of the FULL frame history
    // from empty (the cdc_latest_snapshot convergence property).
    import graft.cdc.{DeleteMsg, InsertMsg, PgColumn, PgOutput, PgTuple, RelationMsg, SlotStore, UpdateMsg}
    import graft.streaming.PgOutputStream
    val framesDir = java.nio.file.Files.createTempDirectory("bootframes").toString
    val slotsDir = java.nio.file.Files.createTempDirectory("bootslots").toString
    val ck1 = java.nio.file.Files.createTempDirectory("bootck1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("bootck2").toString
    def rel(cols: String*) = RelationMsg(700, "public", "accounts", 'd'.toByte,
      cols.map(c => PgColumn(0, c, 25, -1)))
    def tup(vs: String*) = PgTuple(vs.map(Option(_)))

    // ---- history BEFORE the bootstrap (already reflected in the snapshot)
    Seq(
      1L -> PgOutput.encode(rel("pk", "v")),
      2L -> PgOutput.encode(InsertMsg(700, tup("1", "a"))),
      3L -> PgOutput.encode(InsertMsg(700, tup("2", "b"))),
      4L -> PgOutput.encode(UpdateMsg(700, None, None, tup("1", "a1"))),
      5L -> PgOutput.encode(InsertMsg(700, tup("3", "c"))))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)

    // step 1+2: the snapshot stand-in and the slot watermark it was taken at
    val snapshotDf = Seq((1L, "a1"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val slots = new SlotStore(slotsDir)
    slots.setSlot("boot")
    slots.ack("boot", 5L)
    // the consumer's materialized state, seeded from the snapshot
    var state = snapshotDf.as[(Long, String)].collect()
      .map { case (pk, v) => pk -> Map("pk" -> pk.toString, "v" -> v) }.toMap
    def applyEvents(evs: Seq[graft.cdc.ChangeEvent]): Unit =
      evs.sortBy(_.lsn).foreach { e =>
        if (e.op == "DELETE") state -= e.before("pk").toLong
        else state += (e.after("pk").toLong -> e.after)
      }

    // ---- step 3, first incarnation: replayed frame below the watermark,
    // reconnect Relation re-send at a fresh LSN, one update
    Seq(
      4L -> PgOutput.encode(UpdateMsg(700, None, None, tup("1", "a1"))), // replay
      6L -> PgOutput.encode(rel("pk", "v")), // reconnect re-send
      7L -> PgOutput.encode(UpdateMsg(700, None, None, tup("2", "b2"))))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)
    val q1 = PgOutputStream.captureTo(
      PgOutputStream.decodeStream(spark,
        PgOutputStream.resumeFrames(spark, framesDir, slots, "boot")),
      ck1, slots, "boot") { b => applyEvents(b.collect().toSeq) }
    try q1.processAllAvailable() finally q1.stop()
    assert(state(2)("v") == "b2")
    assert(slots.confirmedFlushLsn("boot") == 7L)

    // ---- kill: process died, checkpoint LOST; second incarnation resumes
    // from the durable slot alone. The feed replays an acked frame (7) and
    // then CHANGES THE SCHEMA mid-stream: Relation v2 adds a column; the
    // insert after it decodes against v2, the delete (replica identity
    // full) carries all three columns.
    Seq(
      7L -> PgOutput.encode(UpdateMsg(700, None, None, tup("2", "b2"))), // replay
      8L -> PgOutput.encode(rel("pk", "v", "extra")), // schema change
      9L -> PgOutput.encode(InsertMsg(700, tup("4", "d", "x"))),
      10L -> PgOutput.encode(DeleteMsg(700, 'O'.toByte, tup("3", "c", ""))))
      .toDF("lsn", "data").write.mode("append").parquet(framesDir)
    val slots2 = new SlotStore(slotsDir)
    assert(slots2.confirmedFlushLsn("boot") == 7L, "watermark must survive the crash")
    val q2 = PgOutputStream.captureTo(
      PgOutputStream.decodeStream(spark,
        PgOutputStream.resumeFrames(spark, framesDir, slots2, "boot")),
      ck2, slots2, "boot") { b => applyEvents(b.collect().toSeq) }
    try q2.processAllAvailable() finally q2.stop()
    assert(slots2.confirmedFlushLsn("boot") == 10L)

    // ---- convergence: bootstrap(snapshot@5) ⊕ stream(6..10) must equal a
    // batch replay of the ENTIRE history from empty — including the new
    // schema's column on the post-change row
    val batchEvents = PgOutput.decodeFeed(spark, spark.read.parquet(framesDir))
      .as[graft.cdc.ChangeEvent].collect().toSeq
    var replay = Map[Long, Map[String, String]]()
    batchEvents.sortBy(_.lsn).foreach { e =>
      if (e.op == "DELETE") replay -= e.before("pk").toLong
      else replay += (e.after("pk").toLong -> e.after)
    }
    assert(state == replay, s"stream state $state != batch replay $replay")
    assert(state == Map(
      1L -> Map("pk" -> "1", "v" -> "a1"),
      2L -> Map("pk" -> "2", "v" -> "b2"),
      4L -> Map("pk" -> "4", "v" -> "d", "extra" -> "x")))
  }

  test("file-drop CDC source streams appended parquet batches") {
    val dir = java.nio.file.Files.createTempDirectory("cdcdrop").toString
    val ck = java.nio.file.Files.createTempDirectory("cdcck").toString
    Seq(Change(1, "users", "INSERT", 1, 100, 1.0), Change(2, "users", "UPDATE", 1, 200, 2.0))
      .toDS().write.mode("append").parquet(dir)
    val q = CdcStream.latestSnapshot(CdcStream.fileSource(spark, dir))
      .writeStream.format("memory").queryName("filesnap")
      .outputMode(OutputMode.Update).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      // append a second batch — the stream must pick it up incrementally
      Seq(Change(3, "users", "UPDATE", 1, 300, 3.0)).toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val last = spark.table("filesnap").as[Snapshot].collect().maxBy(_.lsn)
      assert(last == Snapshot("users", 1L, 3L, "UPDATE", 3.0, false))
    } finally q.stop()
  }

  test("streaming funnel: cross-batch stage advances match the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = streaming.BehaviorStream
      .funnel(input.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 views; u2 clicks BEFORE viewing (never qualifies)
      input.addData(
        FunnelEvent(1, "view", 100), FunnelEvent(2, "click", 50),
        FunnelEvent(2, "view", 80))
      q.processAllAvailable()
      // batch 2: u1 clicks (advance), u2 clicks after its view (advance);
      // u1's second view is ignored (already past that stage)
      input.addData(
        FunnelEvent(1, "click", 200), FunnelEvent(1, "view", 150),
        FunnelEvent(2, "click", 90))
      q.processAllAvailable()
      // batch 3: u1 completes; u2 purchase at the SAME ts as its click
      // is not strictly after → no advance
      input.addData(
        FunnelEvent(1, "purchase", 300), FunnelEvent(2, "purchase", 90))
      q.processAllAvailable()

      val got = spark.table("funnel")
        .as[StageReach].collect().toSet
      assert(got == Set(
        StageReach(1, 1, "view", 100, None),
        StageReach(2, 1, "view", 80, None),
        StageReach(1, 2, "click", 200, Some(100L)),
        StageReach(2, 2, "click", 90, Some(10L)),
        StageReach(1, 3, "purchase", 300, Some(100L))))
      // stage totals equal the batch operator over the same event union
      val batch = operators.Behavior.funnel(
        Seq((1L, "view", 100L), (2L, "click", 50L), (2L, "view", 80L),
          (1L, "click", 200L), (1L, "view", 150L), (2L, "click", 90L),
          (1L, "purchase", 300L), (2L, "purchase", 90L))
          .toDF("user_id", "event_type", "ts_us"),
        "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
        .as[(String, Long, Option[Long])].collect().toSeq
      val streamTotals = got.groupBy(_.stage).view
        .mapValues(rs => (rs.size.toLong, rs.flatMap(_.delta_us).reduceOption(_ + _)))
        .toMap
      batch.zipWithIndex.foreach { case ((_, n, sum), i) =>
        assert(streamTotals(i + 1) == ((n, sum)), s"stage ${i + 1}")
      }
    } finally q.stop()
  }

  test("funnel completedTtl evicts only completed users; default retains them") {
    // with a 1 ms TTL, a COMPLETED user's state is evicted once the clock
    // passes; a re-appearing event then re-funnels them from stage 1 (the
    // documented trade-off). An IN-FLIGHT user is never evicted: their late
    // stage-2 event still advances normally. NOTE: processAllAvailable
    // cannot be used here — with ProcessingTimeTimeout the engine always
    // schedules another batch (it must scan state for due timeouts), so
    // `noNewData` is never reached; the sink is POLLED instead, which also
    // matches how a real dashboard consumes this stream.
    implicit val sqlCtx = spark.sqlContext
    def reaches = spark.table("funnelttl").as[StageReach].collect().toSeq
    def eventually(what: String)(f: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < end && !f) Thread.sleep(50)
      assert(f, s"condition not reached: $what; got $reaches")
    }
    val input = MemoryStream[FunnelEvent]
    val q = streaming.BehaviorStream
      .funnel(input.toDS(), Seq("view", "click"), completedTtlMs = Some(1L))
      .writeStream.format("memory").queryName("funnelttl")
      .outputMode(OutputMode.Append).start()
    try {
      // u1 completes the funnel; u2 stops at stage 1
      input.addData(
        FunnelEvent(1, "view", 100), FunnelEvent(1, "click", 200),
        FunnelEvent(2, "view", 100))
      eventually("u1 completes, u2 at stage 1")(
        reaches.exists(r => r.user_id == 1 && r.stage == 2) &&
          reaches.exists(r => r.user_id == 2 && r.stage == 1))
      // the engine triggers continuously; well after the 1 ms TTL, u1's
      // state is evicted by a timeout batch while in-flight u2 survives.
      // The margin is generous: eviction requires only ONE engine batch
      // after the deadline, and the continuous trigger runs them every few
      // ms — but a machine-stall shorter than this sleep must not let u1's
      // re-appearing event land in the same batch as its timeout.
      Thread.sleep(2000)
      input.addData(FunnelEvent(2, "click", 300), FunnelEvent(1, "view", 400))
      // u2 (in-flight across the TTL window) still advances; u1 re-enters
      // at stage 1 because its completed-state entry was evicted
      eventually("u2 advances, u1 re-funnels")(
        reaches.exists(r => r.user_id == 2 && r.stage == 2 && r.ts_us == 300) &&
          reaches.filter(r => r.user_id == 1 && r.stage == 1)
            .map(_.ts_us).sorted == Seq(100L, 400L))
    } finally q.stop()
  }

  test("streaming trending tokens: windowed freq_items matches the batch sketch") {
    // the Misra–Gries aggregate composes with Structured Streaming's
    // windowed aggregation (its binary buffer lives in the state store
    // like any agg buffer) — the "trending topics over a token stream"
    // shape, incremental across micro-batches
    import org.apache.spark.sql.functions._
    graft.plans.NativeFunctions.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (epoch s, token)
    val trend = input.toDF().toDF("ts_s", "tok")
      .withColumn("ts", timestamp_seconds($"ts_s"))
      .groupBy(window($"ts", "60 seconds").as("w"))
      .agg(call_function("freq_items", $"tok", lit(8)).as("hh"))
    val q = trend.writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData((0L, "a"), (1L, "a"), (2L, "b"), (65L, "c"))
      q.processAllAvailable()
      input.addData((3L, "a"), (4L, "b"), (66L, "c"), (67L, "d"))
      q.processAllAvailable()
      val streamed = spark.table("trending").collect().map(_.toString).sorted.toSeq
      val batch = Seq((0L, "a"), (1L, "a"), (2L, "b"), (65L, "c"),
          (3L, "a"), (4L, "b"), (66L, "c"), (67L, "d"))
        .toDF("ts_s", "tok")
        .withColumn("ts", timestamp_seconds($"ts_s"))
        .groupBy(window($"ts", "60 seconds").as("w"))
        .agg(call_function("freq_items", $"tok", lit(8)).as("hh"))
        .collect().map(_.toString).sorted.toSeq
      // capacity ≥ vocabulary ⇒ both sketches are exact ⇒ identical rows
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
      assert(streamed.size == 2) // two 60s windows
    } finally q.stop()
  }

  test("streaming transitions: cross-batch edges match the batch lead pairing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val q = streaming.BehaviorStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append).start()
    val events = Seq(
      // u1: view → click → purchase; the click/purchase tie at ts 200
      // breaks on event_id (3 before 4) — the batch query's exact order
      TransEvent(1, 1, "view", 100), TransEvent(1, 3, "click", 200),
      TransEvent(1, 4, "purchase", 200),
      // u2: single event → no edge
      TransEvent(2, 2, "view", 150),
      // u3: arrives across batches — the state must bridge them
      TransEvent(3, 5, "signup", 50))
    val later = Seq(
      TransEvent(3, 6, "view", 300), TransEvent(3, 7, "error", 400),
      TransEvent(1, 8, "view", 500),
      // strictly out-of-order across the batch seam (u2's stored position
      // is ts 150): dropped — a violated monotonicity guarantee degrades
      // to a missing edge, never a wrong pairing
      TransEvent(2, 9, "click", 120))
    try {
      input.addData(events: _*); q.processAllAvailable()
      input.addData(later: _*); q.processAllAvailable()
      val got = spark.table("trans").as[Transition].collect().toSet
      assert(got == Set(
        Transition(1, "view", "click", 200),
        Transition(1, "click", "purchase", 200),
        Transition(1, "purchase", "view", 500),
        Transition(3, "signup", "view", 300),
        Transition(3, "view", "error", 400)))
      // and the aggregated matrix equals the batch lead-window pairing
      // over the IN-CONTRACT event union (the out-of-order arrival is
      // outside the monotonicity guarantee both forms assume; the batch
      // window would re-sort history the stream no longer has)
      val all = (events ++ later).filter(_.event_id != 9)
        .map(e => (e.user_id, e.event_id, e.event_type, e.ts_us))
        .toDF("user_id", "event_id", "event_type", "ts_us")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val batch = all
        .withColumn("to_type", org.apache.spark.sql.functions.lead("event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .count().as[(String, String, Long)].collect()
        .map { case (f, t, n) => (f, t) -> n }.toMap
      val streamed = got.groupBy(t => (t.from_type, t.to_type))
        .view.mapValues(_.size.toLong).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("transitions idleTtl evicts idle users; re-appearance loses the bridging edge") {
    // with a 1 ms idle TTL, a user silent for a full TTL window is evicted:
    // the edge from the pre-eviction last event to the first post-eviction
    // event is MISSING (the documented bounded-state trade — never a wrong
    // edge), and pairing resumes normally from the re-appearance. With the
    // default (no TTL) the same sequence keeps the bridging edge — pinned by
    // the cross-batch test above. Funnel-TTL caveat: ProcessingTimeTimeout
    // keeps the engine triggering, so the sink is POLLED.
    implicit val sqlCtx = spark.sqlContext
    def edges = spark.table("transttl").as[Transition].collect().toSet
    def eventually(what: String)(f: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < end && !f) Thread.sleep(50)
      assert(f, s"condition not reached: $what; got $edges")
    }
    val input = MemoryStream[TransEvent]
    val q = streaming.BehaviorStream.transitions(input.toDS(), idleTtlMs = Some(1L))
      .writeStream.format("memory").queryName("transttl")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(TransEvent(1, 1, "view", 100), TransEvent(1, 2, "click", 200))
      eventually("pre-eviction edge")(edges.contains(Transition(1, "view", "click", 200)))
      Thread.sleep(2000) // > TTL by orders of magnitude: u1's state evicts
      input.addData(TransEvent(1, 3, "purchase", 300), TransEvent(1, 4, "view", 400))
      // the click→purchase bridge is gone; the post-eviction pair emits
      eventually("post-eviction pairing resumes")(
        edges.contains(Transition(1, "purchase", "view", 400)))
      assert(!edges.contains(Transition(1, "click", "purchase", 300)),
        s"evicted state must lose the bridging edge, not replay it; got $edges")
    } finally q.stop()
  }

  test("attribution idleTtl: a post-eviction purchase credits direct, never stale") {
    implicit val sqlCtx = spark.sqlContext
    def credits = spark.table("attrttl").as[Attribution].collect().toSeq
    def eventually(what: String)(f: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < end && !f) Thread.sleep(50)
      assert(f, s"condition not reached: $what; got $credits")
    }
    val input = MemoryStream[AttrEvent]
    val q = streaming.BehaviorStream.attribution(input.toDS(), idleTtlMs = Some(1L))
      .writeStream.format("memory").queryName("attrttl")
      .outputMode(OutputMode.Append).start()
    try {
      // touch, then an immediate purchase: credited to the touch
      input.addData(AttrEvent(1, 1, "click", 100, 0.0),
        AttrEvent(1, 2, "purchase", 200, 5.0))
      eventually("in-window purchase credits the touch")(
        credits.exists(a => a.event_id == 2 && a.channel == "click"))
      Thread.sleep(2000) // idle past the TTL: the touch row evicts
      // a purchase after eviction has no surviving touch → 'direct' (the
      // stale channel is dropped, never mis-credited)
      input.addData(AttrEvent(1, 3, "purchase", 300, 7.0))
      eventually("post-eviction purchase is direct")(
        credits.exists(a => a.event_id == 3 && a.channel == "direct"))
    } finally q.stop()
  }

  test("sessionize idleTtl: post-eviction sessions never collide with pre-eviction ids") {
    // the r10-VERDICT collision case: with counter ids, eviction erases the
    // counter and a re-appearing user's first new session would re-emit
    // session_id 1 — the SAME key as its first pre-eviction session, so a
    // consumer keying on (user, session_id) silently merges two different
    // sessions. Under TTL the id is the session's start instant (strictly
    // increasing per user across epochs), so the two sessions stay distinct.
    import graft.streaming.{SessEvent, SessionUpdate}
    implicit val sqlCtx = spark.sqlContext
    def rows = spark.table("sessttl").as[SessionUpdate].collect().toSeq
    def eventually(what: String)(f: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < end && !f) Thread.sleep(50)
      assert(f, s"condition not reached: $what; got $rows")
    }
    val input = MemoryStream[SessEvent]
    val q = streaming.SessionStream.sessionize(input.toDS(), gapUs = 1000L,
        idleTtlMs = Some(1L))
      .writeStream.format("memory").queryName("sessttl")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(SessEvent(1, 1, 100L, 2.0), SessEvent(1, 2, 200L, 3.0))
      eventually("pre-eviction session keyed by its start")(
        rows.exists(u => u.session_id == 100L && u.n_events == 2))
      Thread.sleep(2000) // idle past the TTL: user 1's state evicts
      input.addData(SessEvent(1, 3, 5000L, 7.0))
      // the post-eviction session's id is ITS start instant — never a
      // renumbered 1 (or a re-used 100) that collides with old sessions
      eventually("post-eviction session keyed by its own start")(
        rows.exists(u => u.session_id == 5000L && u.n_events == 1))
      assert(!rows.exists(u => u.session_id == 1L || u.session_id == 2L),
        s"TTL mode must never emit counter ids; got $rows")
      assert(rows.filter(_.session_id == 100L).forall(_.n_events <= 2),
        s"the evicted session must not absorb post-eviction events; got $rows")
    } finally q.stop()
  }

  test("streaming sessionize: bridges batches, closes on gap, drops stale") {
    import graft.streaming.{SessEvent, SessionUpdate}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val q = streaming.SessionStream.sessionize(input.toDS(), gapUs = 100L)
      .writeStream.format("memory").queryName("sessups")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(SessEvent(1, 1, 0, 1.0), SessEvent(1, 2, 50, 2.0),
        SessEvent(2, 3, 10, 5.0))
      q.processAllAvailable()
      input.addData(
        SessEvent(1, 4, 120, 0.5),  // gap 70 ≤ 100: same session, bridged
        SessEvent(1, 5, 300, 9.0),  // gap 180 > 100: session 2 opens
        SessEvent(2, 6, 5, 99.0))   // behind u2's stored position: dropped
      q.processAllAvailable()
      val ups = spark.table("sessups").as[SessionUpdate].collect().toSeq
      // batch 1 emitted ONE rollup per touched session, not per event
      assert(ups.count(u => u.user_id == 1 && u.session_id == 1) == 2,
        s"u1 s1 must emit once per touching batch; got $ups")
      // final state per (user, session) = the max-n emission
      val fin = ups.groupBy(u => (u.user_id, u.session_id))
        .map { case (k, v) => k -> v.maxBy(_.n_events) }
      assert(fin((1L, 1L)) == SessionUpdate(1, 1, 3, 0, 120, 3.5))
      assert(fin((1L, 2L)) == SessionUpdate(1, 2, 1, 300, 300, 9.0))
      assert(fin((2L, 1L)) == SessionUpdate(2, 1, 1, 10, 10, 5.0),
        "the stale u2 arrival must be dropped, never resummed")
      assert(!fin.contains((2L, 2L)))
    } finally q.stop()
  }

  test("streaming KMV sketch: any micro-batch split equals the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    graft.plans.NativeFunctions.register(spark)
    val k = 16
    // 300 keys over 2 segments, duplicates included, hashed like the batch
    val hashes = (1L to 300L).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 120) * 2654435761L % 1000003L))

    def runSplit(chunks: Seq[Seq[(String, Long)]]): Map[String, (Seq[Long], Double)] = {
      val input = MemoryStream[SegmentKey]
      val name = s"kmv_${chunks.size}_${System.identityHashCode(chunks)}"
      val q = graft.streaming.SketchStream.kmvDistinct(input.toDS(), k)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        chunks.foreach { c =>
          input.addData(c.map { case (s, h) => SegmentKey(s, h) })
          q.processAllAvailable()
        }
        spark.table(name).as[SketchRow].collect()
          .groupBy(_.segment)
          .map { case (s, rows) => s -> {
            val last = rows.last // Update mode appends; last row = final state
            (last.mins, last.kmv_estimate)
          } }
      } finally q.stop()
    }

    val onego = runSplit(Seq(hashes))
    val threeway = runSplit(Seq(hashes.take(50), hashes.slice(50, 200),
      hashes.drop(200)))
    assert(onego == threeway, "sketch must be micro-batch-split invariant")

    // and both equal the BATCH bottomk_distinct over the same keys
    import org.apache.spark.sql.functions._
    val batch = hashes.toDF("segment", "h")
      .groupBy("segment")
      .agg(call_function("bottomk_distinct", col("h"), lit(k)).as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(onego.view.mapValues(_._1).toMap == batch)
    // state is k-bounded
    onego.values.foreach { case (mins, _) => assert(mins.length <= k) }
  }

  test("streaming Misra-Gries: exact regime equals batch counts across batches") {
    import graft.streaming.{HeavyRow, TokenObs}
    implicit val sqlCtx = spark.sqlContext
    // 2 segments, 6 distinct items < capacity 8 ⇒ no decrement ever fires
    val obs = (1L to 240L).map(i =>
      TokenObs(if (i % 2 == 0) "a" else "b", s"t${i % 6}", i))
    val input = MemoryStream[TokenObs]
    val q = streaming.SketchStream.heavyHitters(input.toDS(), 8)
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode(OutputMode.Update).start()
    try {
      Seq(obs.take(80), obs.slice(80, 200), obs.drop(200)).foreach { c =>
        input.addData(c: _*); q.processAllAvailable()
      }
      val fin = spark.table("hh_exact").as[HeavyRow].collect()
        .groupBy(_.segment).map { case (s, rows) => s -> rows.maxBy(_.n_seen) }
      val batch = obs.groupBy(o => (o.segment, o.item))
        .map { case ((s, t), os) => (s, t, os.size.toLong) }
      for (((seg, tok, n)) <- batch)
        assert(fin(seg).items(tok) == n,
          s"exact-regime count for ($seg,$tok) must equal batch $n")
      fin.foreach { case (s, r) =>
        assert(r.n_seen == obs.count(_.segment == s)) }
    } finally q.stop()
  }

  test("streaming Misra-Gries: approx regime keeps the no-false-negative bound") {
    import graft.streaming.{HeavyRow, TokenObs}
    implicit val sqlCtx = spark.sqlContext
    val cap = 4
    // 2 heavy items (80 + 60 of 200) + 30 light distinct items — distinct
    // count 32 >> capacity 4, so the decrement path runs for real
    val rows = ((1 to 80).map(i => ("hot", i)) ++
      (81 to 140).map(i => ("warm", i)) ++
      (141 to 200).map(i => (s"cold${i % 30}", i)))
      .sortBy(_._2).map { case (t, i) => TokenObs("s", t, i.toLong) }
    val input = MemoryStream[TokenObs]
    val q = streaming.SketchStream.heavyHitters(input.toDS(), cap)
      .writeStream.format("memory").queryName("hh_approx")
      .outputMode(OutputMode.Update).start()
    try {
      Seq(rows.take(70), rows.slice(70, 150), rows.drop(150)).foreach { c =>
        input.addData(c: _*); q.processAllAvailable()
      }
      val last = spark.table("hh_approx").as[HeavyRow].collect().maxBy(_.n_seen)
      assert(last.n_seen == 200L)
      assert(last.items.size <= cap, "state stays capacity-bounded")
      val exact = rows.groupBy(_.item).view.mapValues(_.size.toLong).toMap
      // MG guarantee: any item with true count > n/cap is present...
      for ((t, n) <- exact if n * cap > last.n_seen)
        assert(last.items.contains(t), s"heavy item $t (n=$n) must survive")
      // ...and every reported count is within n/cap of truth, never above
      for ((t, n) <- last.items) {
        assert(n <= exact(t), s"MG count for $t can never exceed truth")
        assert(exact(t) - n <= last.n_seen / cap,
          s"MG undercount for $t must stay within n_seen/capacity")
      }
    } finally q.stop()
  }

  test("streaming Misra-Gries: tied ords fold deterministically (order-independent)") {
    import graft.streaming.{HeavyRow, TokenObs}
    implicit val sqlCtx = spark.sqlContext
    // decrement regime (capacity 2 < 12 distinct) with EVERY ord tied —
    // which counters survive depends on fold order, so the engine's
    // (ord, item) total order must make arrival order irrelevant
    val multiset = ((1 to 9).map(i => TokenObs("s", s"x$i", 7L)) ++
      Seq.fill(6)(TokenObs("s", "hot", 7L)) ++
      Seq.fill(4)(TokenObs("s", "warm", 7L)) ++
      (1 to 3).map(i => TokenObs("s", s"y$i", 7L)))
    def run(rows: Seq[TokenObs], tag: String): Map[String, Long] = {
      val input = MemoryStream[TokenObs]
      val q = streaming.SketchStream.heavyHitters(input.toDS(), 2)
        .writeStream.format("memory").queryName(s"hh_tied_$tag")
        .outputMode(OutputMode.Update).start()
      try {
        input.addData(rows: _*); q.processAllAvailable()
        spark.table(s"hh_tied_$tag").as[HeavyRow].collect().maxBy(_.n_seen).items
      } finally q.stop()
    }
    val a = run(multiset, "a")
    val b = run(scala.util.Random.shuffle(multiset), "b")
    assert(a == b, s"tied-ord folds must agree: $a vs $b")
  }

  test("streaming zscore: online anomalies flag after warmup, split-invariant") {
    import graft.streaming.{Anomaly, MetricEvent}
    // alternating 9/11 baseline (sd ≈ 1), a PRE-warmup spike that must
    // pass silently, a post-warmup spike that must flag, and a stale
    // arrival that must drop
    val base = (1 to 40).map(i =>
      MetricEvent("m", i.toLong, i * 1000L, if (i % 2 == 0) 11.0 else 9.0))
    val preSpike = MetricEvent("m", 100, 5500L, 20.0) // between ids 5 and 6
    val spike = MetricEvent("m", 200, 50000L, 50.0)
    val calm = MetricEvent("m", 201, 51000L, 11.0)
    val stale = MetricEvent("m", 202, 40000L, 999.0) // behind the spike: dropped
    def run(batches: Seq[Seq[MetricEvent]]): Seq[Anomaly] = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MetricEvent]
      val qn = s"zs${batches.size}_${batches.head.size}"
      val q = streaming.SketchStream.zscoreOutliers(input.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(qn).as[Anomaly].collect().toSeq.sortBy(_.event_id)
      } finally q.stop()
    }
    val clean = base.take(5) ++ Seq(preSpike) ++ base.drop(5) ++
      Seq(spike, calm)
    // the stale arrival goes in its OWN later batch: within a batch the
    // event-time sort would legitimately order it; the drop guard exists
    // for the cross-batch seam
    val onego = run(Seq(clean, Seq(stale)))
    // the pre-warmup 20.0 is invisible (n < 30 when it arrives) but it
    // DOES join the moments; the post-warmup spike flags, calm doesn't,
    // stale drops. (With the 20 in the baseline: mean ≈ 1024c,
    // sd ≈ 185c, so z(5000c) ≈ 21 ≫ 3 and z(1100c) ≈ 0.4.)
    assert(onego.map(_.event_id) == Seq(200L), s"got $onego")
    assert(onego.head.n_seen == 41L && onego.head.z > 3.0)
    // micro-batch split invariance under the ordering contract
    val split = run(Seq(clean.take(7), clean.slice(7, 30), clean.drop(30),
      Seq(stale)))
    assert(split == onego, s"split=$split onego=$onego")
  }

  test("maintainedAgg: IVM equals batch recompute, replays/stale dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = CdcStream.maintainedAgg(input.toDS())
      .writeStream.format("memory").queryName("ivm")
      .outputMode(OutputMode.Complete).start()
    def table() = spark.table("ivm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    try {
      input.addData(
        Change(1, "t1", "INSERT", 1, 100, 10.25),
        Change(2, "t1", "INSERT", 2, 110, 5.50),
        Change(3, "t2", "INSERT", 1, 120, 100.00),
        Change(4, "t1", "UPDATE", 1, 130, 11.00),
        // insert→delete of one pk inside a batch nets to NOTHING
        Change(5, "t1", "INSERT", 3, 140, 1.00),
        Change(6, "t1", "DELETE", 3, 150, 0.0))
      q.processAllAvailable()
      assert(table() == Set(("t1", 2L, 16.50), ("t2", 1L, 100.00)))
      input.addData(
        Change(7, "t1", "DELETE", 2, 160, 0.0),
        Change(8, "t2", "UPDATE", 1, 170, 50.00),
        // replayed LSN (same position, corrupted payload) and a stale
        // lower-LSN arrival: both dropped by the stored-LSN guard
        Change(4, "t1", "UPDATE", 1, 130, 999.0),
        Change(2, "t1", "UPDATE", 1, 90, 777.0))
      q.processAllAvailable()
      assert(table() == Set(("t1", 1L, 11.00), ("t2", 1L, 50.00)))
      // parity: the maintained aggregate equals the batch recompute over
      // the highest-LSN row per key of the in-contract feed
      import org.apache.spark.sql.functions._
      val clean = Seq(
        (1L, "t1", "INSERT", 1L, 10.25), (2L, "t1", "INSERT", 2L, 5.50),
        (3L, "t2", "INSERT", 1L, 100.00), (4L, "t1", "UPDATE", 1L, 11.00),
        (5L, "t1", "INSERT", 3L, 1.00), (6L, "t1", "DELETE", 3L, 0.0),
        (7L, "t1", "DELETE", 2L, 0.0), (8L, "t2", "UPDATE", 1L, 50.00))
        .toDF("lsn", "table", "op", "pk", "value")
      val batch = clean
        .groupBy("table", "pk")
        .agg(max_by(struct($"op", $"value"), $"lsn").as("cur"))
        .filter($"cur.op" =!= "DELETE")
        .groupBy("table")
        .agg(count(lit(1)).as("live_rows"),
          (sum(round($"cur.value" * 100).cast("long")) / 100.0).as("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(table() == batch)
    } finally q.stop()
  }

  test("streaming attribution: cross-batch last-touch matches the batch window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttrEvent]
    val q = streaming.BehaviorStream.attribution(input.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    val events = Seq(
      // u1: view → purchase (view credited), then click in a LATER batch
      // re-aims the touch for the second purchase
      AttrEvent(1, 1, "view", 100, 0.0), AttrEvent(1, 2, "purchase", 200, 9.5),
      // u2: purchase with no prior touch → direct
      AttrEvent(2, 3, "purchase", 150, 4.0),
      // u3: touch carried across the batch seam
      AttrEvent(3, 4, "signup", 50, 0.0))
    val later = Seq(
      AttrEvent(1, 5, "click", 300, 0.0), AttrEvent(1, 6, "purchase", 400, 2.5),
      AttrEvent(3, 7, "purchase", 500, 7.0),
      // same-ts tie: the touch's smaller event_id processes first (the
      // batch frame's 1-PRECEDING row order), so it IS credited
      AttrEvent(2, 8, "view", 600, 0.0), AttrEvent(2, 9, "purchase", 600, 1.0),
      // strictly out-of-order across the seam (u2's stored position is
      // ts 600): dropped — degrades to a missed credit, never a rewrite
      AttrEvent(2, 10, "purchase", 140, 3.0))
    try {
      input.addData(events: _*); q.processAllAvailable()
      input.addData(later: _*); q.processAllAvailable()
      val got = spark.table("attr").as[Attribution].collect().toSet
      assert(got == Set(
        Attribution(1, 2, "view", 200, 9.5),
        Attribution(2, 3, "direct", 150, 4.0),
        Attribution(1, 6, "click", 400, 2.5),
        Attribution(3, 7, "signup", 500, 7.0),
        Attribution(2, 9, "view", 600, 1.0)))
      // per-purchase channels equal the batch q_attribution window over
      // the IN-CONTRACT event union (the out-of-order arrival is outside
      // the monotonicity guarantee both forms assume)
      import org.apache.spark.sql.functions._
      val all = (events ++ later).filter(_.event_id != 10)
        .map(e => (e.user_id, e.event_id, e.event_type, e.ts_us, e.value))
        .toDF("user_id", "event_id", "event_type", "ts_us", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val batch = all
        .withColumn("touch", last(
          when(col("event_type").isin("view", "click", "signup"), col("event_type")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), coalesce(col("touch"), lit("direct")).as("channel"))
        .as[(Long, String)].collect().toMap
      assert(got.map(a => a.event_id -> a.channel).toMap == batch)
    } finally q.stop()
  }
}
