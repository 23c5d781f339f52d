package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ordered-behavior analytics over the `events` stream (SURVEY.md §2):
  * conversion funnels and cohort retention — the session/user-journey
  * queries an events warehouse runs next to the relational core. Both are
  * pure integer arithmetic (epoch-microsecond timestamps, epoch-week
  * buckets) so the DuckDB oracle matches bit-for-bit.
  *
  * Scale shape: every stage is a linear shuffle keyed on `user_id` — the
  * per-user reductions happen map-side, no window over the full event log,
  * and the per-stage user tables that chain the funnel are one row per
  * converted user (monotonically shrinking).
  */
object BehaviorQueries {

  /** events with ts normalized to epoch microseconds (ns parquet → long). */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    e.withColumn("ts_us", Tables.tsMicros(e))
  }

  /** Epoch-week bucket size in microseconds. */
  private val weekUs = 604800000000L

  /** Time-ordered, mtime-stamped event chunks — the shared replay input of
    * the streaming behavior gates AND (r12, bench hygiene) every other
    * gate whose feed is a ts_us-quartile 4-chunk replay of `events` with a
    * column subset/derivation of this payload (q_zscore_stream renames,
    * src_txlog_stream_sink derives v4): the chunk keying is identical, so
    * one feed write serves them all — a batch delivers the same row set
    * under any projection, and each gate projects after the readStream. */
  private val behaviorFeedMemo = new graft.operators.SessionMemo[String]

  /** The shared feed's on-disk schema (readStream needs it declared). */
  private[queries] val behaviorFeedSchemaDdl =
    "user_id LONG, event_id LONG, event_type STRING, ts_us LONG, value DOUBLE"

  private[queries] def behaviorFeedDir(s: SparkSession, dir: String): String =
    behaviorFeedMemo.get(s, dir) {
      graft.streaming.StreamGate.writeOrderedChunks(
        ev(s, dir).select(col("user_id"), col("event_id"),
          col("event_type"), col("ts_us"), col("value")),
        "ts_us", chunks = 4, prefix = "graft-behavior-stream")
    }

  /** Hash-shuffled chunk replay for the LATE-DATA gate: chunks keyed by a
    * replayable md5 residue of event_id — deliberately DECORRELATED from
    * event time, so every batch after the first delivers genuinely late
    * rows (the events table's ids are time-ordered; chunking by id would
    * make the late-drop gate vacuous, verified zero drops at sf0.01). */
  private val lateFeedMemo = new graft.operators.SessionMemo[String]

  private def lateFeedDir(s: SparkSession, dir: String): String =
    lateFeedMemo.get(s, dir) {
      graft.streaming.StreamGate.writeOrderedChunks(
        ev(s, dir).select(col("event_id"), col("ts_us"), col("value"),
          pmod(conv(substring(md5(col("event_id").cast("string")), 1, 12),
            16, 10).cast("long"), lit(4)).as("arr")),
        "arr", chunks = 4, prefix = "graft-late-stream")
    }

  /** Per-SIDE ordered feeds for the stream-stream join gate: each side is
    * its own file source (two independent readStreams over two
    * directories), split from the same event log. */
  private val ssjFeedMemo = new graft.operators.SessionMemo[String]

  private def ssjFeedDir(s: SparkSession, dir: String, et: String): String =
    ssjFeedMemo.get(s, s"$et:$dir") {
      graft.streaming.StreamGate.writeOrderedChunks(
        ev(s, dir).filter(col("event_type") === et)
          .select(col("user_id"), col("event_id"), col("ts_us")),
        "ts_us", chunks = 4, prefix = s"graft-ssj-$et")
    }

  /** The DELIBERATELY-SKEWED stream-join feeds (r13 — VERDICT item 9):
    * the ssj feeds with every ≡0-mod-10 event's user remapped to ONE hot
    * key (-1) — 10% of both streams lands on a single user, the hot-key
    * lake whose pair mass grows quadratically (SCALING addendum 28). */
  private val skewSsjFeedMemo = new graft.operators.SessionMemo[String]

  private def skewSsjFeedDir(s: SparkSession, dir: String, et: String): String =
    skewSsjFeedMemo.get(s, s"$et:$dir") {
      graft.streaming.StreamGate.writeOrderedChunks(
        ev(s, dir).filter(col("event_type") === et)
          .select(when(pmod(col("event_id"), lit(10)) === 0, lit(-1L))
            .otherwise(col("user_id")).as("user_id"),
            col("event_id"), col("ts_us")),
        "ts_us", chunks = 4, prefix = s"graft-ssjskew-$et")
    }

  /** The replayable hot-side admission rule: keep a hot-user row iff its
    * 48-bit md5 residue mod `m` is 0 — content-deterministic (arrival
    * order can't change the kept set) and exact in DuckDB. The gate runs
    * the view-side 1/8 stratum; the STRESS knob (r14 — VERDICT item 7)
    * is the same rule at m = 64 on BOTH sides, cutting hot pair mass
    * ~64² = 4096× — gated at the densified hot key in SkewStressSpec
    * with the pair counts recorded (SCALING.md addendum 33). */
  private[graft] def hotThin(idCol: org.apache.spark.sql.Column,
      m: Long = 8L) =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 12), 16, 10)
      .cast("long"), lit(m)) === 0L

  /** Triplicated feed for the exactly-once gate: every event rides THREE
    * byte-identical copies in three mtime-ordered files (copy ordinal =
    * chunk key), so batches 2 and 3 deliver only cross-batch duplicates —
    * the case in-batch dedup can't cover. Copies are identical ON PURPOSE:
    * whichever arrival the engine keeps, the output bytes are the same, so
    * the emission set is deterministic without pinning which-copy-wins. */
  private val dupFeedMemo = new graft.operators.SessionMemo[String]

  private def dupFeedDir(s: SparkSession, dir: String): String =
    dupFeedMemo.get(s, dir) {
      graft.streaming.StreamGate.writeOrderedChunks(
        ev(s, dir).select(col("event_id"), col("user_id"),
            col("event_type"), col("ts_us"), col("value"))
          .withColumn("arr", explode(array(lit(0L), lit(1L), lit(2L)))),
        "arr", chunks = 3, prefix = "graft-dup-stream")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // STREAM-STREAM JOIN, gated (r9): Spark's symmetric-hash join of two
    // LIVE inputs — purchases pair with the same user's views from the
    // trailing hour as BOTH sides arrive (neither side is a static table;
    // each buffers state the other probes). The gate pins the JOIN
    // contract: every qualifying pair is emitted exactly once, no matter
    // how the two file sources interleave their micro-batches — with a
    // no-drop watermark horizon the emission set is a pure function of
    // the data (= the batch interval join, which oracles it). The
    // state-EVICTION half of the contract (finite watermark bounding the
    // buffers) is pinned separately: StreamingSpec's interval-join test
    // evicts with a real 1h delay, and the q_tumbling/late_drop gates pin
    // the watermark semantics themselves. State here is user-keyed — at
    // production scale the join shuffles both streams once on user_id and
    // each side's buffer holds one join-window of rows per user.
    "q_stream_join" -> ((s, dir) => {
      def side(et: String, a: String) = s.readStream
        .schema("user_id LONG, event_id LONG, ts_us LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(ssjFeedDir(s, dir, et))
        .select(col("user_id").as(s"${a}_user"),
          col("event_id").as(s"${a}_id"),
          timestamp_micros(col("ts_us")).as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "3650 days")
      val joined = side("purchase", "p").join(side("view", "v"),
        expr("p_user = v_user AND " +
          "v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"))
      graft.streaming.StreamGate.run(s, joined, "ssj_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(
          col("p_id").as("purchase_id"), col("v_id").as("view_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
            .as("delta_us")))
      }.orderBy("purchase_id", "view_id")
    }),

    // SKEW-BOUNDED STREAM JOIN (r13 — VERDICT item 9): the knobs a
    // production stream turns when one key goes hot and pair mass goes
    // quadratic (addendum 28 measured q_stream_join's output +26% on the
    // 10% hot-key lake — quadratic OUTPUT, not a melted partition). Two
    // knobs, both gated here on the DELIBERATELY-SKEWED feed (10% of
    // both streams on one user): (1) a TIGHT window — 5-minute interval
    // + a real 1-hour watermark, so each side's buffer holds a bounded
    // time-slice per key instead of the whole feed (the state bound is
    // spec-asserted via the state-store row counts in Round13OpsSpec);
    // (2) hot-side ADMISSION THINNING — the hot key's view stream keeps
    // a deterministic 1/8 md5 stratum before the join (the sampling move
    // that cuts hot-pair mass 8× while leaving every cold key exact).
    // Emission determinism under real eviction: both feeds are ts-ordered
    // per source and the global watermark is the min over sources, so a
    // row is never late relative to its own source's horizon and every
    // qualifying pair is emitted — the oracle is the batch replay of the
    // same skew mapping + thinning + tight window.
    "q_stream_join_capped" -> ((s, dir) => {
      // the tight window derives from the DATA (span/48 — a fixed clock
      // interval goes vacuous at small lakes, the empty-gate canary) and
      // lands in the plan as INTERVAL LITERALS; the eviction horizon is
      // 4 windows, comfortably past the join range so determinism holds
      val b = ev(s, dir).agg(min("ts_us"), max("ts_us")).head()
      val wUs = (b.getLong(1) - b.getLong(0)) / 48 + 1
      val delayS = 4L * wUs / 1000000L + 1L
      def side(et: String, a: String) = s.readStream
        .schema("user_id LONG, event_id LONG, ts_us LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(skewSsjFeedDir(s, dir, et))
        .select(col("user_id").as(s"${a}_user"),
          col("event_id").as(s"${a}_id"),
          timestamp_micros(col("ts_us")).as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", s"$delayS seconds")
      val views = side("view", "v")
        .filter(col("v_user") =!= -1L || hotThin(col("v_id")))
      val joined = side("purchase", "p").join(views,
        expr("p_user = v_user AND " +
          s"v_ts BETWEEN p_ts - INTERVAL $wUs MICROSECOND AND p_ts"))
      graft.streaming.StreamGate.run(s, joined, "ssjcap_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink
          .select(col("p_user"), col("p_id"), col("v_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
              .as("delta_us"))
          .groupBy(when(col("p_user") === -1L, 1L).otherwise(0L)
            .as("is_hot"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("delta_us").as("sum_delta_us"),
            sum(pmod(col("p_id") * lit(1000003L) + col("v_id"),
              lit(1000000007L))).as("pair_checksum")))
      }.orderBy("is_hot")
    }),

    // EXACTLY-ONCE dedup, gated (r9): `dropDuplicatesWithinWatermark` —
    // the at-least-once → exactly-once repair every ingestion pipeline
    // runs in front of its sink. The triplicated feed delivers every
    // event three times across THREE different micro-batches (see
    // dupFeedDir — batches 2/3 are pure cross-batch duplicates), and the
    // emission set must be exactly one copy per event_id: the per-key
    // state survives batch boundaries. The gate horizon covers the whole
    // feed (emission set replay-order-free); production bounds the
    // horizon to the real redelivery window, evicting each key's state
    // one watermark-delay after its event time — the eviction semantics
    // are the watermark gates' contract, not re-pinned here.
    "q_exactly_once_stream" -> ((s, dir) => {
      val stream = s.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, " +
          "ts_us LONG, value DOUBLE, arr LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(dupFeedDir(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts"), col("value"))
        .withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark("event_id")
      graft.streaming.StreamGate.run(s, stream, "dedup_once_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value")))
      }.orderBy("event_id")
    }),

    // NATIVE SESSION WINDOWS, gated (r9): Spark's `session_window` operator
    // — the state store merges/extends per-user sessions and emits each
    // once the eviction watermark passes its end — against the same
    // gap-split rule the batch operator uses (probed and pinned: an event
    // at EXACTLY previous-end merges — split iff gap > 30 min, the batch
    // q_sessionize rule; session end = last event + gap; a session whose
    // end EQUALS the final watermark emits — end ≤ wm, ms precision).
    // This gates the operator q_sessionize_stream's hand-rolled engine
    // re-implements: same semantics, zero custom state code. The ordered
    // replay has no late rows, so the emission set is the pure
    // event-time-distribution function the oracle replays as integer
    // arithmetic; trailing unfinalized sessions are ABSENT by semantics.
    "q_session_window_stream" -> ((s, dir) => {
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
          round(col("value") * lit(10000)).cast("long").as("v4"))
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      graft.streaming.StreamGate.run(s, stream, "sw_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"),
          round(col("sv4") / lit(10000.0), 4).as("sum_value")))
      }.orderBy("user_id", "session_start_us")
    }),

    // STREAMING transition matrix, gated (r8): `BehaviorStream.transitions`
    // (per-user state = ONE last-event row, each arrival emits its
    // (from → to) edge immediately) runs over the time-ordered chunk
    // replay, and the edge emissions aggregate into the SAME matrix the
    // batch q_transition_matrix computes — so the batch matrix SQL oracles
    // the streaming ENGINE's emission set end-to-end. The matrix is built
    // inside the gate run (O(types²) rows, lineage-cut) so the memory sink
    // can drop.
    "q_transitions_stream" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .select("user_id", "event_id", "event_type", "ts_us")
        .as[graft.streaming.TransEvent]
      graft.streaming.StreamGate.run(s,
          graft.streaming.BehaviorStream.transitions(stream), "trans_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sinkTable =>
        val m = sinkTable
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_trans"))
        val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
        graft.operators.Checkpointing.cut(
          m.withColumn("p_trans",
            round(col("n_trans").cast("double") / sum("n_trans").over(byFrom), 4)))
      }.orderBy("from_type", "to_type")
    }),

    // STREAMING last-touch attribution, gated (r8): each purchase is
    // credited the moment it lands (`BehaviorStream.attribution` — per-user
    // state is the current touch + last position), and the per-channel
    // rollup over the emission set must equal the batch q_attribution
    // window — the batch SQL oracles the streaming engine directly. Same
    // 1e4-scaled revenue fold applied to the emitted purchases.
    "q_attribution_stream" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .as[graft.streaming.AttrEvent]
      graft.streaming.StreamGate.run(s,
          graft.streaming.BehaviorStream.attribution(stream), "attr_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sinkTable =>
        val p = sinkTable
          .withColumn("rev4", round(col("value") * lit(10000)).cast("long"))
        val tot = p.agg(count(lit(1)).as("total_conv"))
        graft.operators.Checkpointing.cut(
          p.groupBy("channel")
            .agg(count(lit(1)).as("n_conversions"),
              round(sum("rev4") / lit(10000.0), 4).as("attributed_value"))
            .crossJoin(broadcast(tot))
            .withColumn("share",
              round(col("n_conversions").cast("double") / col("total_conv"), 4))
            .select("channel", "n_conversions", "attributed_value", "share"))
      }.orderBy("channel")
    }),
    // STREAMING sessionization, gated (r9): `SessionStream.sessionize`
    // (per-user state = ONE current-session rollup row; each micro-batch
    // re-emits the rollup of every session it touched) runs over the
    // time-ordered chunk replay, and the LATEST emission per (user,
    // session) — picked distributively by max n_events, never a driver
    // fold — must equal the batch 30-min-gap q_sessionize rollup, whose
    // SQL oracles the engine end-to-end. Emissions are O(touched sessions
    // per batch); the file-sink gate keeps the driver at O(1).
    "q_sessionize_stream" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .select("user_id", "event_id", "ts_us", "value")
        .as[graft.streaming.SessEvent]
      graft.streaming.StreamGate.run(s,
          graft.streaming.SessionStream.sessionize(stream, gapUs = 1800000000L),
          "sess_gate",
          org.apache.spark.sql.streaming.OutputMode.Update()) { sinkTable =>
        graft.operators.Checkpointing.cut(sinkTable
          .groupBy("user_id", "session_id")
          .agg(max_by(struct(col("n_events"), col("session_start_us"),
            col("session_end_us"), col("sum_value")), col("n_events")).as("f"))
          .select(col("user_id"), col("session_id"),
            col("f.n_events").as("n_events"),
            col("f.session_start_us").as("session_start_us"),
            col("f.session_end_us").as("session_end_us"),
            round(col("f.sum_value"), 4).as("session_value")))
      }.orderBy("user_id", "session_id")
    }),

    // WATERMARKED event-time window aggregation, gated (r9): Spark's OWN
    // windowed-aggregation engine — withWatermark + window() + Append mode,
    // the canonical Structured Streaming stateful operator — run through
    // the ordered chunk replay. Append emits a window exactly once, when
    // the watermark passes its END (boundary pinned by probe + spec: a
    // window whose end EQUALS the final watermark emits; the watermark is
    // max event-time minus the 10-min delay at MILLISECOND precision), so
    // the emission set is a pure function of the event-time distribution —
    // chunk-order-free — and replays in the oracle as integer floor
    // arithmetic over the batch table. Values fold as 1e4-scaled longs in
    // the state store (order-free exact sums across micro-batches); the
    // trailing unfinalized windows are absent BY THE SEMANTICS — that is
    // the watermark contract under test.
    "q_tumbling_stream" -> ((s, dir) => {
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .select(timestamp_micros(col("ts_us")).as("ts"),
          round(col("value") * lit(10000)).cast("long").as("v4"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      graft.streaming.StreamGate.run(s, stream, "tumbling_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(
          unix_millis(col("w.start")).as("hour_start_ms"),
          col("n_events"),
          round(col("sv4") / lit(10000.0), 4).as("sum_value")))
      }.orderBy("hour_start_ms")
    }),

    // STREAMING funnel, gated (r9 continuation): `BehaviorStream.funnel` —
    // per-user state is ONE (stage, ts) cursor; each arriving event that
    // advances the funnel emits its StageReach immediately — over the
    // time-ordered chunk replay. The greedy advance rule ("first
    // qualifying event strictly after the previous stage") is the SAME
    // fixpoint the batch fold computes, so the per-stage rollup of the
    // emission set equals the batch q_funnel table and the batch SQL
    // oracles the engine (cross-batch parity law already spec'd in
    // StreamingSpec; this puts it inside the hash gate).
    "q_funnel_stream" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.AttrEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(behaviorFeedDir(s, dir))
        .select("user_id", "event_type", "ts_us")
        .as[graft.streaming.FunnelEvent]
      graft.streaming.StreamGate.run(s,
          graft.streaming.BehaviorStream.funnel(stream,
            Seq("view", "click", "purchase")), "funnel_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink
          .groupBy(col("stage"), col("stage_name"))
          .agg(count(lit(1)).as("n_users"), sum("delta_us").as("sum_delta_us"))
          .select(concat(col("stage").cast("string"), lit("_"),
            col("stage_name")).as("stage"), col("n_users"),
            col("sum_delta_us"), col("stage").as("stage_idx")))
      }.orderBy("stage_idx").drop("stage_idx")
    }),

    // LATE-DATA DROP accounting, gated (r9 continuation) — the OTHER half
    // of the watermark contract q_tumbling_stream pins: the hash-shuffled
    // feed delivers each batch a mix of fresh and LATE rows, and Spark's
    // windowed aggregation must (a) drop a late row iff its window's end
    // <= the batch's LATE-EVENTS watermark — which is the PREVIOUS batch's
    // eviction watermark (Spark's two-watermark design: late filtering
    // lags eviction by one batch, exactly what rules out a kept late row
    // landing in an already-emitted window; equality drops, spec'd), (b)
    // fold late-but-open rows into their still-live windows, and (c)
    // finalize exactly the windows the eviction watermark passed. The
    // oracle replays all three as integer arithmetic: chunk = md5(id) % 4,
    // wm_late(k) = max event-time over chunks <= k-2 (ms floor) − 10 min,
    // kept iff window_end > wm_late(chunk), emitted iff window_end <=
    // final eviction wm.
    "q_late_drop_stream" -> ((s, dir) => {
      // The oracle re-derives ENGINE SCHEDULING, not just data math: one
      // chunk file per micro-batch (maxFilesPerTrigger=1 over the
      // mtime-ordered feed) and the two-watermark design where the
      // late-events watermark lags eviction by exactly one batch
      // (SPARK-40925 watermark propagation). That model is pinned to the
      // Spark 4.1 line and canaried by StreamingSpec's boundary probes
      // (end == wm emits, equality drops) — on any other Spark line fail
      // LOUDLY here instead of surfacing as an inscrutable hash mismatch.
      require(s.version.startsWith("4.1."),
        s"q_late_drop_stream's oracle models Spark 4.1 micro-batch " +
          s"watermark propagation (late wm = previous batch's eviction " +
          s"wm); re-probe StreamingSpec's watermark canaries under " +
          s"Spark ${s.version} before trusting this gate")
      val stream = s.readStream
        .schema("event_id LONG, ts_us LONG, value DOUBLE, arr LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(lateFeedDir(s, dir))
        .select(timestamp_micros(col("ts_us")).as("ts"),
          round(col("value") * lit(10000)).cast("long").as("v4"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      graft.streaming.StreamGate.run(s, stream, "late_gate",
          org.apache.spark.sql.streaming.OutputMode.Append()) { sink =>
        graft.operators.Checkpointing.cut(sink.select(
          unix_millis(col("w.start")).as("hour_start_ms"),
          col("n_events"),
          round(col("sv4") / lit(10000.0), 4).as("sum_value")))
      }.orderBy("hour_start_ms")
    }),

    // Conversion funnel view → click → purchase with STRICT ordering: a
    // click only counts after the user's first view, a purchase only after
    // that qualifying click. Each stage is min-per-user over a filtered
    // event subset joined to the previous stage's one-row-per-user table —
    // three linear user_id shuffles, reusable exchange, no self-join of the
    // raw log. sum_delta_us carries the exact integer stage-transition mass.
    "q_funnel" -> ((s, dir) =>
      graft.operators.Behavior.funnel(ev(s, dir), "user_id", "event_type",
        "ts_us", Seq("view", "click", "purchase"))),

    // The TIME-BOUNDED funnel ("convert within 3 days"): identical stage
    // chaining, but a stage event qualifies only inside the window after
    // the previous stage — the form product analytics actually reports.
    // Same linear user-keyed shuffles; the window is one more integer
    // predicate in the stage join, free at any scale.
    "q_funnel_windowed" -> ((s, dir) =>
      graft.operators.Behavior.funnel(ev(s, dir), "user_id", "event_type",
        "ts_us", Seq("view", "click", "purchase"),
        maxGapUs = Some(259200000000L))),

    // Cohort retention matrix: cohort = epoch-week of the user's first
    // signup, activity = distinct (user, week) pairs at or after the
    // cohort week. Integer `div` week bucketing keeps both engines in
    // exact agreement (no calendar/week-start dialect). The distinct
    // collapses the log to one row per user-week BEFORE the cohort join.
    "q_retention" -> ((s, dir) =>
      graft.operators.Behavior.retention(ev(s, dir), "user_id", "event_type",
        "ts_us", "signup", weekUs)),

    // Event-type Markov transition matrix: per-user next-event pairing
    // (lead over the per-user stream — per-key window, bounded by a user's
    // fan-in), then one groupBy on the O(types²) pair space; the row
    // probability normalizes over the aggregated table, so no second pass
    // over the log. (event_id breaks ts ties deterministically.)
    "q_transition_matrix" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val trans = ev(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
      trans.withColumn("p_trans",
          round(col("n_trans").cast("double") / sum("n_trans").over(byFrom), 4))
        .orderBy("from_type", "to_type")
    }),

    // Journey PATTERN MATCHING (the MATCH_RECOGNIZE / CEP class, as
    // relational algebra): each user's full event history becomes one
    // ordered code string — built by sorting fixed-width
    // zeropad(ts)·zeropad(id)·code keys per user and stripping the sort
    // prefixes with ONE codegen'd regexp_replace (never an interpreted
    // per-element lambda) — then each behavioral regex runs ONCE per
    // user (leftmost non-overlapping, identical in Java regex and RE2).
    // Scale shape: one user-keyed shuffle, per-user strings bounded by
    // per-user fan-in (the q_drawdown argument), patterns map-only over
    // the O(users) journey table, O(patterns) rows out.
    "q_event_pattern" -> ((s, dir) => {
      val code = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "signup", "s")
        .when(col("event_type") === "purchase", "p")
        .otherwise("e")
      val pats = Seq("vc*p", "sv", "e{2,}", "v[ce]*p")
      // lpad TRUNCATES instead of failing when a value outgrows its slot,
      // and a negative value's '-' would survive the digit strip — both
      // corrupt the sort key SILENTLY, so the domain is asserted loudly
      // (raise_error evaluates only on a violating row)
      val guard = when(col("ts_us") >= 0 && col("event_id") >= 0 &&
          col("event_id") < 10000000000L, lit(""))
        .otherwise(raise_error(lit("q_event_pattern: sort-key domain " +
          "exceeded (need 0 <= ts_us and 0 <= event_id < 1e10) — widen the " +
          "fixed-width key")))
      val journeys = ev(s, dir)
        .select(col("user_id"),
          concat(guard, lpad(col("ts_us").cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 10, "0"), code).as("k"))
        .groupBy("user_id")
        .agg(regexp_replace(array_join(array_sort(collect_list(col("k"))), ""),
          "[0-9]{30}", "").as("journey"))
      val stackArgs = pats.map(p =>
        s"'${p.replace("'", "''")}', regexp_count(journey, '${p.replace("'", "''")}')")
        .mkString(", ")
      journeys
        .select(expr(s"stack(${pats.size}, $stackArgs) AS (pattern, m)"))
        .groupBy("pattern")
        .agg(sum("m").as("n_matches"),
          count(when(col("m") > 0, 1)).as("n_users"))
        .orderBy("pattern")
    }),

    // COHORT LTV curve (retention × revenue — the metric a subscription /
    // marketplace team actually steers by): per (signup-cohort week,
    // week offset), purchase revenue and the CUMULATIVE lifetime value
    // per cohort user. Revenue folds as 1e4-scaled longs (order-free);
    // the cumulative window runs over the O(cohorts × weeks) AGGREGATED
    // table (never the log); cohort sizes broadcast. Epoch-week integer
    // `div` buckets — no calendar dialect.
    "q_cohort_ltv" -> ((s, dir) => {
      val e = ev(s, dir)
      val cohorts = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(expr(s"min(ts_us) div $weekUs").as("cohort_wk"))
      val sizes = cohorts.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_users"))
      val buys = e.filter(col("event_type") === "purchase")
        .withColumn("rev4", round(col("value") * lit(10000)).cast("long"))
        .withColumn("wk", expr(s"ts_us div $weekUs"))
        .join(cohorts, "user_id")
        .filter(col("wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_buyers"), sum("rev4").as("rev4"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort_wk").orderBy("week_offset")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      buys.join(broadcast(sizes), "cohort_wk")
        .withColumn("cum4", sum("rev4").over(wCum))
        .select(col("cohort_wk"), col("week_offset"), col("n_buyers"),
          round(col("rev4") / lit(10000.0), 4).as("revenue"),
          round(col("cum4") / (lit(10000.0) * col("cohort_users")), 4)
            .as("cum_ltv_per_user"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // LAST-TOUCH ATTRIBUTION: each purchase is credited to the user's most
    // recent PRIOR touch event (view/click/signup, strictly earlier in
    // (ts, event_id) order), or 'direct' when none precedes it — the
    // marketing-channel question every events warehouse answers. The touch
    // lookup is `last(_, ignoreNulls)` over a user-partitioned window with
    // a `(-∞, -1]` row frame (bounded per-user partitions, never a global
    // window or a log self-join). Revenue folds as 1e4-scaled longs
    // (order-free); the two final divisions run once per channel row with
    // identical IEEE operands on both engines. 100 TB: one user-keyed
    // exchange + one O(channels) groupBy.
    "q_attribution" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val purch = ev(s, dir)
        .withColumn("touch",
          last(when(col("event_type").isin("view", "click", "signup"), col("event_type")),
            ignoreNulls = true).over(byUser))
        .filter(col("event_type") === "purchase")
        .withColumn("channel", coalesce(col("touch"), lit("direct")))
        .withColumn("rev4", round(col("value") * lit(10000)).cast("long"))
      val tot = purch.agg(count(lit(1)).as("total_conv"))
      purch.groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"),
          round(sum("rev4") / lit(10000.0), 4).as("attributed_value"))
        .crossJoin(broadcast(tot))
        .withColumn("share",
          round(col("n_conversions").cast("double") / col("total_conv"), 4))
        .select("channel", "n_conversions", "attributed_value", "share")
        .orderBy("channel")
    }))

  private val evCte =
    "WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events)"

  /** Shared by q_funnel and its streaming-engine gate: "incremental result
    * == batch result" is exactly the streaming claim, so the oracle is the
    * batch funnel SQL verbatim. */
  private val funnelSql =
    s"""$evCte,
       |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e
       |      WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, min(e.ts_us) AS c_ts, max(v.v_ts) AS v_ts
       |      FROM e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts_us > v.v_ts
       |      GROUP BY e.user_id),
       |p AS (SELECT e.user_id, min(e.ts_us) AS p_ts, max(c.c_ts) AS c_ts
       |      FROM e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts
       |      GROUP BY e.user_id)
       |SELECT '1_view' AS stage, count(*) AS n_users,
       |       CAST(NULL AS BIGINT) AS sum_delta_us FROM v
       |UNION ALL
       |SELECT '2_click', count(*), CAST(sum(c_ts - v_ts) AS BIGINT) FROM c
       |UNION ALL
       |SELECT '3_purchase', count(*), CAST(sum(p_ts - c_ts) AS BIGINT) FROM p
       |ORDER BY stage""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_funnel_stream" -> funnelSql,
    "q_funnel" -> funnelSql,

    // the batch interval join IS the streaming claim under a no-drop
    // horizon: every qualifying (purchase, trailing-hour view) pair of
    // the same user, exactly once
    "q_stream_join" ->
      s"""$evCte
         |SELECT p.event_id AS purchase_id, v.event_id AS view_id,
         |       p.ts_us - v.ts_us AS delta_us
         |FROM e p JOIN e v ON p.user_id = v.user_id
         |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
         |  AND v.ts_us BETWEEN p.ts_us - 3600000000 AND p.ts_us
         |ORDER BY purchase_id, view_id""".stripMargin,

    // the batch replay of the same skew mapping + hot-side md5 thinning
    // + 5-minute interval join, aggregated per key class
    "q_stream_join_capped" ->
      s"""$evCte,
         |sk AS (SELECT CASE WHEN event_id % 10 = 0 THEN -1
         |                   ELSE user_id END AS user_id,
         |              event_id, event_type, ts_us FROM e),
         |v AS (SELECT * FROM sk WHERE event_type = 'view'
         |        AND (user_id <> -1 OR
         |             ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT
         |               % 8 = 0)),
         |p AS (SELECT * FROM sk WHERE event_type = 'purchase'),
         |b AS (SELECT (max(ts_us) - min(ts_us)) // 48 + 1 AS w FROM e),
         |pairs AS (
         |  SELECT p.user_id, p.event_id AS pid, v.event_id AS vid,
         |         p.ts_us - v.ts_us AS delta_us
         |  FROM p JOIN v ON p.user_id = v.user_id, b
         |  WHERE v.ts_us BETWEEN p.ts_us - b.w AND p.ts_us)
         |SELECT CAST(CASE WHEN user_id = -1 THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_hot,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(delta_us) AS BIGINT) AS sum_delta_us,
         |       CAST(sum((pid * 1000003 + vid) % 1000000007) AS BIGINT)
         |         AS pair_checksum
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    // gap-split islands (split iff gap > 30 min — probed equal to the
    // native merge rule), session end = last event + gap, emitted iff
    // end ≤ the final ms-floor eviction watermark; the lag and the
    // cumulative island sum share ONE (ts_us, event_id) order so
    // same-instant ties can never split an island differently
    "q_session_window_stream" ->
      s"""$evCte,
         |b AS (SELECT ((max(ts_us) // 1000) - 600000) * 1000 AS wm FROM e),
         |x AS (SELECT user_id, event_id, ts_us,
         |             CAST(round(value * 10000) AS BIGINT) AS v4,
         |             lag(ts_us) OVER (PARTITION BY user_id
         |                              ORDER BY ts_us, event_id) AS prev
         |      FROM e),
         |i AS (SELECT *, CASE WHEN prev IS NULL
         |                       OR ts_us - prev > 1800000000 THEN 1
         |                     ELSE 0 END AS ni
         |      FROM x),
         |sg AS (SELECT *, sum(ni) OVER (PARTITION BY user_id
         |                ORDER BY ts_us, event_id
         |                ROWS UNBOUNDED PRECEDING) AS sid
         |       FROM i),
         |g AS (SELECT user_id, sid, min(ts_us) AS session_start_us,
         |             max(ts_us) + 1800000000 AS session_end_us,
         |             count(*) AS n_events,
         |             round(CAST(sum(v4) AS DOUBLE) / 10000.0, 4) AS sum_value
         |      FROM sg GROUP BY 1, 2)
         |SELECT user_id, session_start_us, session_end_us, n_events, sum_value
         |FROM g, b WHERE session_end_us <= wm
         |ORDER BY user_id, session_start_us""".stripMargin,

    // exactly one surviving copy per event_id — the original event log
    "q_exactly_once_stream" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events ORDER BY event_id""".stripMargin,

    // the late-drop model replayed end-to-end: batch k's LATE-EVENTS
    // watermark is the EVICTION watermark of batch k-1, i.e. the max
    // event-time over chunks <= k-2 (Spark's two-watermark design — late
    // filtering is one batch more lenient than eviction, which is exactly
    // what makes "kept late row into an already-emitted window"
    // impossible); keep iff the row's window outlives it, emit iff the
    // final eviction watermark passed the window — boundaries inclusive
    // exactly as spec'd in StreamingSpec
    "q_late_drop_stream" ->
      s"""$evCte,
         |a AS (
         |  SELECT ts_us, value,
         |         ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT % 4
         |           AS chunk
         |  FROM e),
         |cm AS (SELECT chunk, max(ts_us) AS mx FROM a GROUP BY chunk),
         |wm AS (SELECT c1.chunk, ((max(c2.mx) // 1000) - 600000) * 1000 AS wm_us
         |       FROM cm c1 JOIN cm c2 ON c2.chunk + 1 < c1.chunk GROUP BY c1.chunk),
         |kept AS (
         |  SELECT a.* FROM a LEFT JOIN wm USING (chunk)
         |  WHERE ((a.ts_us // 3600000000) + 1) * 3600000000
         |        > coalesce(wm.wm_us, -1)),
         |fin AS (SELECT ((max(ts_us) // 1000) - 600000) * 1000 AS fwm FROM e),
         |g AS (SELECT ts_us // 3600000000 AS hb, count(*) AS n_events,
         |             round(CAST(sum(CAST(round(value * 10000) AS BIGINT))
         |                   AS BIGINT) / 10000.0, 4) AS sum_value
         |      FROM kept GROUP BY hb)
         |SELECT hb * 3600000 AS hour_start_ms, n_events, sum_value
         |FROM g, fin WHERE (hb + 1) * 3600000000 <= fwm
         |ORDER BY hour_start_ms""".stripMargin,

    // same stage CTEs with the 3-day window bound added to each join
    "q_funnel_windowed" ->
      s"""$evCte,
         |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.ts_us) AS c_ts, max(v.v_ts) AS v_ts
         |      FROM e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.ts_us > v.v_ts
         |        AND e.ts_us <= v.v_ts + 259200000000
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.ts_us) AS p_ts, max(c.c_ts) AS c_ts
         |      FROM e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts
         |        AND e.ts_us <= c.c_ts + 259200000000
         |      GROUP BY e.user_id)
         |SELECT '1_view' AS stage, count(*) AS n_users,
         |       CAST(NULL AS BIGINT) AS sum_delta_us FROM v
         |UNION ALL
         |SELECT '2_click', count(*), CAST(sum(c_ts - v_ts) AS BIGINT) FROM c
         |UNION ALL
         |SELECT '3_purchase', count(*), CAST(sum(p_ts - c_ts) AS BIGINT) FROM p
         |ORDER BY stage""".stripMargin,

    "q_retention" ->
      s"""$evCte,
         |su AS (SELECT user_id, min(ts_us) // $weekUs AS cohort_wk FROM e
         |       WHERE event_type = 'signup' GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id, ts_us // $weekUs AS wk FROM e)
         |SELECT su.cohort_wk, act.wk - su.cohort_wk AS week_offset,
         |       count(*) AS n_active
         |FROM act JOIN su ON act.user_id = su.user_id
         |WHERE act.wk >= su.cohort_wk
         |GROUP BY su.cohort_wk, week_offset
         |ORDER BY cohort_wk, week_offset""".stripMargin,

    // the batch 30-min-gap sessionize + rollup SQL (identical to
    // q_sessionize's oracle) checks the streaming engine's final emission
    // per (user, session)
    "q_sessionize_stream" ->
      s"""$evCte,
         |gaps AS (
         |  SELECT user_id, event_id, ts_us, value,
         |         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
         |                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         |                   > 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM e),
         |sess AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM gaps)
         |SELECT user_id, session_id, count(*) AS n_events,
         |       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
         |       round(sum(value), 4) AS session_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    // the watermark contract replayed as integer arithmetic: a window is
    // in the emission set iff its end <= max(ts) floored to ms minus the
    // 10-min delay (the probed append-mode boundary, end == wm emits)
    "q_tumbling_stream" ->
      s"""$evCte,
         |b AS (SELECT ((max(ts_us) // 1000) - 600000) * 1000 AS wm FROM e),
         |w AS (SELECT (ts_us // 3600000000) * 3600000000 AS ws_us,
         |             CAST(round(value * 10000) AS BIGINT) AS v4
         |      FROM e),
         |g AS (SELECT ws_us, count(*) AS n_events,
         |             round(CAST(sum(v4) AS DOUBLE) / 10000.0, 4) AS sum_value
         |      FROM w GROUP BY ws_us)
         |SELECT ws_us // 1000 AS hour_start_ms, n_events, sum_value
         |FROM g, b WHERE ws_us + 3600000000 <= wm
         |ORDER BY hour_start_ms""".stripMargin,

    // the batch matrix SQL oracles the streaming engine's emission set
    "q_transitions_stream" ->
      s"""$evCte,
         |t AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
         |  FROM e),
         |m AS (SELECT from_type, to_type, count(*) AS n_trans
         |      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
         |       round(CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY from_type), 4) AS p_trans
         |FROM m ORDER BY from_type, to_type""".stripMargin,

    // the batch attribution SQL oracles the streaming engine's credits
    "q_attribution_stream" ->
      s"""$evCte,
         |a AS (
         |  SELECT *, last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
         |                            THEN event_type END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
         |  FROM e),
         |p AS (SELECT COALESCE(touch, 'direct') AS channel,
         |             CAST(round(value * 10000) AS BIGINT) AS rev4
         |      FROM a WHERE event_type = 'purchase')
         |SELECT channel, count(*) AS n_conversions,
         |       round(CAST(sum(rev4) AS DOUBLE) / 10000.0, 4) AS attributed_value,
         |       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM p), 4) AS share
         |FROM p GROUP BY channel ORDER BY channel""".stripMargin,

    "q_transition_matrix" ->
      s"""$evCte,
         |t AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
         |  FROM e),
         |m AS (SELECT from_type, to_type, count(*) AS n_trans
         |      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
         |       round(CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY from_type), 4) AS p_trans
         |FROM m ORDER BY from_type, to_type""".stripMargin,

    // string_agg ORDER BY (ts_us, event_id) replays the engine's sorted
    // fixed-width-key journey; RE2's regexp_extract_all and Java's
    // regexp_count agree on leftmost non-overlapping greedy matching
    "q_event_pattern" ->
      s"""$evCte,
         |j AS (
         |  SELECT user_id,
         |         string_agg(CASE event_type WHEN 'view' THEN 'v'
         |                    WHEN 'click' THEN 'c' WHEN 'signup' THEN 's'
         |                    WHEN 'purchase' THEN 'p' ELSE 'e' END, ''
         |                    ORDER BY ts_us, event_id) AS journey
         |  FROM e GROUP BY user_id),
         |m AS (
         |  SELECT pat, len(regexp_extract_all(journey, pat)) AS m
         |  FROM j CROSS JOIN (VALUES ('vc*p'), ('sv'), ('e{2,}'),
         |       ('v[ce]*p')) pats(pat))
         |SELECT pat AS pattern, CAST(sum(m) AS BIGINT) AS n_matches,
         |       CAST(count(*) FILTER (m > 0) AS BIGINT) AS n_users
         |FROM m GROUP BY pat ORDER BY pattern""".stripMargin,

    // same epoch-week buckets, 1e4-scaled longs, cumulative window over
    // the aggregated cohort table
    "q_cohort_ltv" ->
      s"""$evCte,
         |co AS (SELECT user_id, min(ts_us) // $weekUs AS cohort_wk FROM e
         |       WHERE event_type = 'signup' GROUP BY user_id),
         |sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_users
         |       FROM co GROUP BY 1),
         |b AS (SELECT co.cohort_wk,
         |             (e.ts_us // $weekUs) - co.cohort_wk AS week_offset,
         |             e.user_id, CAST(round(e.value * 10000) AS BIGINT) AS rev4
         |      FROM e JOIN co USING (user_id)
         |      WHERE e.event_type = 'purchase'
         |        AND e.ts_us // $weekUs >= co.cohort_wk),
         |g AS (SELECT cohort_wk, week_offset,
         |             CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
         |             CAST(sum(rev4) AS BIGINT) AS rev4
         |      FROM b GROUP BY 1, 2),
         |c AS (SELECT *, CAST(sum(rev4) OVER (PARTITION BY cohort_wk
         |               ORDER BY week_offset ROWS UNBOUNDED PRECEDING)
         |             AS BIGINT) AS cum4 FROM g)
         |SELECT cohort_wk, week_offset, n_buyers,
         |       round(CAST(rev4 AS DOUBLE) / 10000.0, 4) AS revenue,
         |       round(CAST(cum4 AS DOUBLE) / (10000.0 * cohort_users), 4)
         |         AS cum_ltv_per_user
         |FROM c JOIN sz USING (cohort_wk)
         |ORDER BY cohort_wk, week_offset""".stripMargin,

    // same prior-frame IGNORE NULLS touch window, 1e4-scaled revenue longs
    "q_attribution" ->
      s"""$evCte,
         |a AS (
         |  SELECT *, last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
         |                            THEN event_type END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
         |  FROM e),
         |p AS (SELECT COALESCE(touch, 'direct') AS channel,
         |             CAST(round(value * 10000) AS BIGINT) AS rev4
         |      FROM a WHERE event_type = 'purchase')
         |SELECT channel, count(*) AS n_conversions,
         |       round(CAST(sum(rev4) AS DOUBLE) / 10000.0, 4) AS attributed_value,
         |       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM p), 4) AS share
         |FROM p GROUP BY channel ORDER BY channel""".stripMargin)
}
