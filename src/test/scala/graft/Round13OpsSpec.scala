package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.col

/** The r13 TxLog hardening + surface growth, per VERDICT r12 / ADVICE:
  * the checkpoint pins its own head (TOCTOU), the subsumed-replay guard
  * survives checkpoint truncation, readChanges plans through the
  * checkpoint (truncation no longer strands incremental consumers), the
  * driver-held live-add count is loudly bounded, data skipping goes
  * typed (string/decimal/date), and add actions carry partition values
  * pruned before stats. */
class Round13OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.TxLog

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogr13").toString + "/t"

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("typed data skipping (pure prune rule): string, decimal, and date " +
      "envelopes drop provably-disjoint files; absent or unparseable " +
      "stats always keep") {
    val a = TxLog.AddFile("a", Map(
      "s" -> ("apple", "cherry"), "d" -> ("1.25", "2.75"),
      "dt" -> ("2024-01-01", "2024-03-31")))
    val b = TxLog.AddFile("b", Map(
      "s" -> ("melon", "peach"), "d" -> ("10.5", "20.5"),
      "dt" -> ("2024-06-01", "2024-09-30")))
    val c = TxLog.AddFile("c") // no stats: conservative keep under every bound
    val g = TxLog.AddFile("g", Map("d" -> ("junk", "junk"),
      "dt" -> ("junk", "junk"))) // unparseable: keep
    val all = Seq(a, b, c, g)
    assert(TxLog.pruneAdds(all,
      Seq(TxLog.SkipRangeString("s", "banana", "grape")))
      .map(_.name) == Seq("a", "c", "g"))
    assert(TxLog.pruneAdds(all,
      Seq(TxLog.SkipRangeDecimal("d", BigDecimal(3), BigDecimal("9.9"))))
      .map(_.name) == Seq("c", "g"))
    assert(TxLog.pruneAdds(all,
      Seq(TxLog.SkipRangeDate("dt", java.time.LocalDate.parse("2024-04-01"),
        java.time.LocalDate.parse("2024-05-31"))))
      .map(_.name) == Seq("c", "g"))
    // overlap at the boundary keeps (BETWEEN is inclusive on both sides)
    assert(TxLog.pruneAdds(Seq(a),
      Seq(TxLog.SkipRangeString("s", "cherry", "fig"))).map(_.name) == Seq("a"))
  }

  test("string-predicate data skipping end-to-end: fewer dirs opened, " +
      "pruned ≡ unpruned") {
    val t = freshTable()
    val groups = Seq("alpha" -> "delta", "echo" -> "hotel",
      "india" -> "lima", "mike" -> "papa")
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
      "november", "oscar", "papa")
    val adds = groups.zipWithIndex.map { case ((lo, hi), i) =>
      val nm = s"w$i"
      words.filter(w => w >= lo && w <= hi).zipWithIndex
        .map { case (w, j) => (w, (i * 10 + j).toLong) }.toDF("w", "n")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm, TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("w")))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil))
    val schema = StructType.fromDDL("w STRING, n BIGINT")
    val skip = Seq(TxLog.SkipRangeString("w", "foxtrot", "kilo"))
    assert(TxLog.pruneAdds(TxLog.liveAdds(spark, t), skip)
      .map(_.name) == Seq("w1", "w2"))
    val unpruned = TxLog.read(spark, t, schema)
      .filter(col("w").between("foxtrot", "kilo"))
    val pruned = TxLog.read(spark, t, schema, None, skip)
      .filter(col("w").between("foxtrot", "kilo"))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      unpruned.collect().map(_.getString(0)).sorted.toSeq)
    assert(pruned.inputFiles.length < unpruned.inputFiles.length)
  }

  test("partition values ride the add action, roundtrip the log, and a " +
      "partition filter prunes before (and composes with) stats bounds") {
    val t = freshTable()
    val adds = (0 until 4).map { i =>
      val nm = s"p$i"
      (i * 10L until i * 10L + 10L).map(x => (x, s"src$i")).toDF("x", "src")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm,
        TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("x")),
        part = Map("src" -> s"src$i"))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil))
    // the part map survives the log roundtrip verbatim
    val live = TxLog.liveAdds(spark, t)
    assert(live.map(_.part) == (0 until 4).map(i => Map("src" -> s"src$i")))
    // partition filter alone: 2 of 4 dirs
    val pf = TxLog.SkipPartition("src", Set("src1", "src2"))
    assert(TxLog.pruneAdds(live, Seq(pf)).map(_.name) == Seq("p1", "p2"))
    // composed with a stats bound on a SECOND column: 1 dir
    assert(TxLog.pruneAdds(live,
      Seq(pf, TxLog.SkipRange("x", 0L, 14L))).map(_.name) == Seq("p1"))
    // a file with no recorded value for the filter column is kept
    assert(TxLog.pruneAdds(Seq(TxLog.AddFile("n")), Seq(pf))
      .map(_.name) == Seq("n"))
    // results identical, fewer files opened
    val schema = StructType.fromDDL("x BIGINT, src STRING")
    val unpruned = TxLog.read(spark, t, schema)
      .filter(col("src").isin("src1", "src2") && col("x") <= 14L)
    val pruned = TxLog.read(spark, t, schema, None,
        Seq(pf, TxLog.SkipRange("x", 0L, 14L)))
      .filter(col("src").isin("src1", "src2") && col("x") <= 14L)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      unpruned.collect().map(_.getLong(0)).sorted.toSeq)
    assert(pruned.inputFiles.length < unpruned.inputFiles.length)
  }

  test("maxLiveAdds: planning metadata past the bound is loud and names " +
      "the optimize remedy; ≤0 disables") {
    val t = freshTable()
    (0 until 3).foreach { i =>
      Seq((i.toLong, i.toLong)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/d$i")
    }
    assert(TxLog.tryCommit(spark, t, 0L, (0 until 3).map(i => s"d$i"), Nil))
    try {
      spark.conf.set("graft.txlog.maxLiveAdds", "2")
      val e = intercept[IllegalArgumentException](TxLog.liveAdds(spark, t))
      assert(e.getMessage.contains("maxLiveAdds") &&
        e.getMessage.contains("optimize"))
      intercept[IllegalArgumentException](TxLog.read(spark, t, xySchema))
      spark.conf.set("graft.txlog.maxLiveAdds", "0") // disabled
      assert(TxLog.liveAdds(spark, t).size == 3)
      spark.conf.set("graft.txlog.maxLiveAdds", "3")
      assert(TxLog.read(spark, t, xySchema).count() == 3L)
    } finally spark.conf.unset("graft.txlog.maxLiveAdds")
  }

  test("checkpoint pins its head: checkpoints racing a committer never " +
      "capture post-head adds (every _ckpt.v replays to exactly the adds " +
      "at-or-before v)") {
    val t = freshTable()
    Seq((0L, 0L)).toDF("x", "y").coalesce(1).write.parquet(s"$t/d0")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("d0"), Nil))
    // a committer thread appends while the main thread checkpoints —
    // with the pre-r13 live-head walk, a commit landing between the head
    // probe and the walk leaks post-head adds into _ckpt.<head> and
    // wedges every later read with add-of-already-live
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      (1 to 12).foreach { v =>
        val fut = ex.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            val nm = s"d$v"
            Seq((v.toLong, v.toLong)).toDF("x", "y").coalesce(1)
              .write.parquet(s"$t/$nm")
            TxLog.tryCommit(spark, t, v.toLong, Seq(nm), Nil)
          }
        })
        TxLog.checkpoint(spark, t)
        assert(fut.get(60, java.util.concurrent.TimeUnit.SECONDS))
      }
    } finally ex.shutdown()
    // invariant check: every checkpoint file carries exactly adds ≤ v
    val fs = fsOf(t)
    val ld = new org.apache.hadoop.fs.Path(t, "_log")
    val ckpts = fs.listStatus(ld).map(_.getPath.getName)
      .filter(_.startsWith("_ckpt.")).sorted
    assert(ckpts.nonEmpty)
    ckpts.foreach { nm =>
      val v = nm.stripPrefix("_ckpt.").stripSuffix(".json").toLong
      val in = fs.open(new org.apache.hadoop.fs.Path(ld, nm))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val names = """"add":"(d\d+)"""".r.findAllMatchIn(text)
        .map(_.group(1)).toSeq.sorted
      assert(names == (0L to v).map(i => s"d$i").sorted,
        s"$nm must carry exactly adds ≤ v$v, got $names")
    }
    // and planning still works at every version
    assert(TxLog.read(spark, t, xySchema).count() == 13L)
  }

  test("subsumed-replay guard: a checkpoint-truncated table still refuses " +
      "a foreign-producer watermark (loud), while a compacted one accepts") {
    // foreign table: txn records under the default appId but dirs NOT in
    // this producer's naming — built by something else entirely
    val t = freshTable()
    (0 to 1).foreach { v =>
      Seq((v.toLong, v.toLong)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/z$v")
      assert(TxLog.tryCommitActions(spark, t, v.toLong,
        Seq(TxLog.AddFile(s"z$v")), Nil, txns = Seq("stream" -> v.toLong)))
    }
    assert(TxLog.checkpoint(spark, t) == 1L)
    val fs = fsOf(t)
    (0 to 1).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(t, f"_log/$v%010d.json"), false))
    // a fresh stream replaying batch 0: watermark says delivered, the
    // recording commit is truncated, the snapshot carries z0/z1 (not
    // b0000000000) and no compaction rewrite — LOUD, never a silent skip
    val e = intercept[IllegalArgumentException](
      TxLog.commitBatch(Seq((9L, 9L)).toDF("x", "y"), t, 0L))
    assert(e.getMessage.contains("foreign table"))

    // compacted control: same shape but the layout was legitimately
    // rewritten by OPTIMIZE before the checkpoint — the replay skips
    val t2 = freshTable()
    (0L to 1L).foreach(b =>
      TxLog.commitBatch(Seq((b, b)).toDF("x", "y"), t2, b))
    assert(TxLog.optimize(spark, t2, Some(xySchema)).contains(2L))
    assert(TxLog.checkpoint(spark, t2) == 2L)
    val fs2 = fsOf(t2)
    (0 to 2).foreach(v => fs2.delete(
      new org.apache.hadoop.fs.Path(t2, f"_log/$v%010d.json"), false))
    TxLog.commitBatch(Seq((99L, 99L)).toDF("x", "y"), t2, 1L) // skips
    assert(TxLog.read(spark, t2, xySchema).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
  }

  test("readChanges plans through the checkpoint: post-truncation windows " +
      "after it work, windows below it are loud with the re-baseline " +
      "remedy, and fromVersion=-1 delivers snapshot+suffix") {
    val t = freshTable()
    (0 until 6).foreach { v =>
      Seq((v.toLong, v.toLong)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/d$v")
      assert(TxLog.tryCommit(spark, t, v.toLong, Seq(s"d$v"), Nil))
    }
    assert(TxLog.checkpoint(spark, t) == 5L)
    // append two more after the checkpoint
    (6 until 8).foreach { v =>
      Seq((v.toLong, v.toLong)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/d$v")
      assert(TxLog.tryCommit(spark, t, v.toLong, Seq(s"d$v"), Nil))
    }
    def xs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).sorted.toSeq
    // untruncated: a window below the checkpoint still serves (full walk)
    assert(xs(TxLog.readChanges(spark, t, xySchema, 1L, 3L)) == Seq(2L, 3L))
    // truncate everything at-or-before the checkpoint
    val fs = fsOf(t)
    (0 to 5).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(t, f"_log/$v%010d.json"), false))
    // window after the checkpoint: served from the surviving suffix
    assert(xs(TxLog.readChanges(spark, t, xySchema, 5L, 7L)) == Seq(6L, 7L))
    assert(xs(TxLog.readChanges(spark, t, xySchema, 6L, 7L)) == Seq(7L))
    // below the checkpoint: loud, with the remedy
    val e = intercept[IllegalArgumentException](
      TxLog.readChanges(spark, t, xySchema, 1L, 7L))
    assert(e.getMessage.contains("re-baseline"))
    // initial load: the checkpoint state plus the suffix IS the table
    assert(xs(TxLog.readChanges(spark, t, xySchema, -1L, 7L)) ==
      (0L to 7L).toSeq)
    assert(xs(TxLog.readChanges(spark, t, xySchema, -1L, 6L)) ==
      (0L to 6L).toSeq)
  }

  test("MERGE INTO: matched-update/-delete and conditional not-matched-" +
      "insert compose; the first merge bucketizes, later merges rewrite " +
      "only touched buckets; ambiguity and key-assignment are loud") {
    import graft.sources.TxLogMerge
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    // unbucketed initial snapshot: keys 0..9, y = 10·x
    (0L until 10L).map(x => (x, x * 10)).toDF("x", "y")
      .coalesce(2).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    def state(): Map[Long, Long] = TxLog.read(spark, t, xySchema)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merge 1 (establishes the layout): keys 2,4,6 — delete where y=40,
    // update y := y + __src_y elsewhere; key 12 inserts
    val s1 = Seq((2L, 1L), (4L, 1L), (6L, 1L), (12L, 99L)).toDF("x", "y")
    val v1 = TxLogMerge.merge(spark, t, xySchema, s1, Seq("x"),
      updateSet = Map("y" -> (col("y") + col(s"${TxLogMerge.Src}y"))),
      deleteWhen = Some(col("y") <=> 40L),
      insertWhen = Some(lit(true)), nBuckets = 4)
    assert(v1 == 1L)
    val exp1 = ((0L until 10L).filter(_ != 4L).map(x =>
      x -> (if (x == 2L || x == 6L) x * 10 + 1 else x * 10)) :+ (12L -> 99L))
      .toMap
    assert(state() == exp1)
    // layout established: every live dir is mrg0000000001/__bucket=*
    val live1 = TxLog.liveAdds(spark, t)
    assert(live1.forall(_.name.startsWith("mrg0000000001/__bucket=")))
    assert(live1.forall(_.part.get("__nb").contains("4")))
    // merge 2: touch ONE key — only its bucket rewrites, the others
    // carry forward by dir name
    val s2 = Seq((12L, 1L)).toDF("x", "y")
    val v2 = TxLogMerge.merge(spark, t, xySchema, s2, Seq("x"),
      updateSet = Map("y" -> (col("y") + lit(1L))))
    assert(v2 == 2L)
    assert(state() == exp1.updated(12L, 100L))
    val live2 = TxLog.liveAdds(spark, t)
    assert(live2.count(_.name.startsWith("mrg0000000002/")) == 1,
      "exactly one bucket rewritten")
    assert(live2.count(_.name.startsWith("mrg0000000001/")) ==
      live1.size - 1, "untouched buckets carry forward by name")
    // no-insert clause: unmatched source rows drop silently by contract
    val v3 = TxLogMerge.merge(spark, t, xySchema,
      Seq((777L, 7L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> lit(0L)))
    assert(v3 == 3L && !state().contains(777L))
    // ambiguity is loud
    val dup = Seq((2L, 1L), (2L, 2L)).toDF("x", "y")
    val e1 = intercept[IllegalArgumentException](
      TxLogMerge.merge(spark, t, xySchema, dup, Seq("x"),
        updateSet = Map("y" -> lit(0L))))
    assert(e1.getMessage.contains("unique"))
    // assigning a key column is loud
    val e2 = intercept[IllegalArgumentException](
      TxLogMerge.merge(spark, t, xySchema, s2, Seq("x"),
        updateSet = Map("x" -> lit(0L))))
    assert(e2.getMessage.contains("key column"))
    // point-lookup data skipping over the merged layout: bucket prune
    val key = 12L
    val b = Math.floorMod(
      spark.range(1).select(
        org.apache.spark.sql.functions.xxhash64(lit(key))).head().getLong(0),
      4L)
    val pruned = TxLog.read(spark, t, xySchema, None,
      Seq(TxLog.SkipPartition("__bucket", Set(b.toString))))
    assert(pruned.filter(col("x") === key).count() == 1L)
    assert(pruned.inputFiles.length < TxLog.read(spark, t, xySchema)
      .inputFiles.length)
  }

  test("substring-dedup rewrite (planted overlap): the first doc by " +
      "ingest order keeps the span, later docs excise exactly its " +
      "covered tokens, and the removed-token accounting is lossless") {
    val shared = "one two three four five six seven eight" // an 8-token span
    val docs = Seq(
      (10L, s"alpha beta $shared gamma"), // keeper: min doc_id
      (20L, s"x $shared y z"), // span at positions 1..8 → excised
      (30L, shared) // the whole doc IS the span → fully excised
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.spanRewrite(spark, docs)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_removed", "rewritten")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((10L, 11L, 0L,
      s"alpha beta $shared gamma")), "keeper doc carries unchanged")
    assert(out(1) == ((20L, 11L, 8L, "x y z")),
      "the planted span's 8 tokens are excised, flanks survive")
    assert(out(2) == ((30L, 8L, 8L, "")),
      "a doc that IS the span rewrites to empty, not a dropped row")
    assert(out.map(_._3).sum == 16L, "lossless accounting")
    // no cross-doc duplication → identity rewrite
    val solo = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val soloOut = graft.operators.Dedup.spanRewrite(spark, solo)
      .orderBy("doc_id").collect()
    assert(soloOut.forall(_.getAs[Long]("n_removed") == 0L))
  }

  test("skew-bounded stream join: a real eviction watermark bounds the " +
      "join state to a time slice while the emission set stays the exact " +
      "batch interval join") {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    // 8 bursts 1000 s apart: each burst has one view at t and one
    // purchase at t+1s (a pair inside the 5 s window); with a 10 s
    // watermark every burst's state is evicted long before the next
    // base epoch well past 0: a row AT the initial watermark (epoch 0)
    // is dropped as late — that's watermark semantics, not the join's
    val rows = (0 until 8).flatMap { c =>
      val t = 1000000000000000L + c * 1000L * 1000000L
      Seq(("view", 1L, c * 10L, t),
        ("purchase", 1L, c * 10L + 1L, t + 1000000L))
    }
    val df = rows.toDF("et", "user_id", "event_id", "ts_us")
    def feed(et: String) = graft.streaming.StreamGate.writeOrderedChunks(
      df.filter(col("et") === et).select("user_id", "event_id", "ts_us"),
      "ts_us", chunks = 8, prefix = s"r13-ssj-$et")
    val (vDir, pDir) = (feed("view"), feed("purchase"))
    def side(dir: String, a: String) = spark.readStream
      .schema("user_id LONG, event_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(col("user_id").as(s"${a}_user"),
        col("event_id").as(s"${a}_id"),
        timestamp_micros(col("ts_us")).as(s"${a}_ts"))
      .withWatermark(s"${a}_ts", "10 seconds")
    val joined = side(pDir, "p").join(side(vDir, "v"),
      expr("p_user = v_user AND " +
        "v_ts BETWEEN p_ts - INTERVAL 5 SECONDS AND p_ts"))
    val td = java.nio.file.Files.createTempDirectory("r13-ssj-run").toString
    val q = joined.writeStream
      .option("checkpointLocation", s"$td/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("p_id", "v_id").write.mode("append").parquet(s"$td/sink")
      }.start()
    val stateRows =
      try {
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    val emitted = spark.read.parquet(s"$td/sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(emitted == (0 until 8).map(c => (c * 10L + 1L, c * 10L)),
      "every burst's pair emitted exactly once — the batch interval join")
    // without eviction both sides' 16 rows would sit in state; the real
    // watermark keeps only the last burst's slice
    assert(stateRows <= 8L,
      s"state must hold a bounded time slice, held $stateRows of 16 rows")
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("distributed manifest: predicates evaluate over the manifest " +
      "scan with the pruneAdds keep rules, only matching names reach " +
      "the driver, and a stale manifest is refused") {
    val t = freshTable()
    val adds = (0 until 4).map { i =>
      val nm = s"p$i"
      (i * 10L until i * 10L + 10L).map(x => (x, s"src$i")).toDF("x", "src")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm,
        TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("x")),
        part = Map("src" -> s"src$i"))
    } :+ {
      // a junk-stats file: unparseable envelope must KEEP on both paths
      Seq((100L, "srcx")).toDF("x", "src").coalesce(1).write.parquet(s"$t/pj")
      TxLog.AddFile("pj", Map("x" -> ("junk", "junk")))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil))
    assert(TxLog.writeManifest(spark, t) == 0L)
    val schema = StructType.fromDDL("x BIGINT, src STRING")
    val skips = Seq(
      TxLog.SkipPartition("src", Set("src1", "src2")),
      TxLog.SkipRange("x", 0L, 14L))
    // decision equivalence: the manifest path opens exactly the files
    // the driver path keeps (p1 + the partition-less junk file)
    assert(TxLog.pruneAdds(TxLog.liveAdds(spark, t), skips)
      .map(_.name) == Seq("p1", "pj"))
    val viaM = TxLog.readViaManifest(spark, t, schema, skips)
    assert(viaM.inputFiles.forall(f =>
      f.contains("/p1/") || f.contains("/pj/")))
    // result equivalence against the driver-planned read
    val viaD = TxLog.read(spark, t, schema, None, skips)
    assert(viaM.collect().map(_.getLong(0)).sorted.toSeq ==
      viaD.collect().map(_.getLong(0)).sorted.toSeq)
    // typed bounds through the manifest: string envelope prune
    val t2 = freshTable()
    (0 until 2).foreach { i =>
      Seq((s"w$i", i.toLong)).toDF("w", "n").coalesce(1)
        .write.parquet(s"$t2/d$i")
    }
    assert(TxLog.tryCommitActions(spark, t2, 0L, (0 until 2).map { i =>
      TxLog.AddFile(s"d$i",
        TxLog.statsOf(spark.read.parquet(s"$t2/d$i"), Seq("w")))
    }, Nil))
    TxLog.writeManifest(spark, t2)
    val one = TxLog.readViaManifest(spark, t2,
      StructType.fromDDL("w STRING, n BIGINT"),
      Seq(TxLog.SkipRangeString("w", "w1", "w1")))
    assert(one.collect().map(_.getString(0)).toSeq == Seq("w1"))
    assert(one.inputFiles.forall(_.contains("/d1/")))
    // stale manifest: a new commit makes the old manifest unusable
    Seq((999L, "srcz")).toDF("x", "src").coalesce(1).write.parquet(s"$t/pz")
    assert(TxLog.tryCommit(spark, t, 1L, Seq("pz"), Nil))
    val e = intercept[IllegalArgumentException](
      TxLog.readViaManifest(spark, t, schema, Nil))
    assert(e.getMessage.contains("manifest"))
    assert(TxLog.writeManifest(spark, t) == 1L)
    assert(TxLog.readViaManifest(spark, t, schema, Nil).count() == 42L)
  }

  test("merge change feed: deletes carry the preimage, updates carry " +
      "both images, inserts carry the new row; absent feeds are loud") {
    import graft.sources.TxLogMerge
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    (0L until 4L).map(x => (x, x * 10)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    // source: delete x=1, update x=2 (y += 100), insert x=9; x=3 update
    // too
    val src = Seq((1L, 0L), (2L, 100L), (3L, 100L), (9L, 90L))
      .toDF("x", "y")
    assert(TxLogMerge.merge(spark, t, xySchema, src, Seq("x"),
      updateSet = Map("y" -> (col("y") + col(s"${TxLogMerge.Src}y"))),
      deleteWhen = Some(col("x") <=> 1L),
      insertWhen = Some(lit(true)), nBuckets = 2, changeFeed = true) == 1L)
    val feed = TxLogMerge.readChangeFeed(spark, t, xySchema, 1L)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(feed == Seq(
      ("delete", 1L, 10L),
      ("insert", 9L, 90L),
      ("update_postimage", 2L, 120L),
      ("update_postimage", 3L, 130L),
      ("update_preimage", 2L, 20L),
      ("update_preimage", 3L, 30L)))
    // table state agrees with the feed's postimages
    assert(TxLog.read(spark, t, xySchema).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 0L), (2L, 120L), (3L, 130L), (9L, 90L)))
    // a version without a recorded feed is loud
    assert(TxLogMerge.merge(spark, t, xySchema, Seq((9L, 1L)).toDF("x", "y"),
      Seq("x"), updateSet = Map("y" -> lit(0L))) == 2L)
    val e = intercept[IllegalArgumentException](
      TxLogMerge.readChangeFeed(spark, t, xySchema, 2L))
    assert(e.getMessage.contains("change feed"))
  }

  test("CDF streaming mode: follows a merging table's change feed one " +
      "version per trigger, restart resumes, and a followed version " +
      "without a feed is loud") {
    import graft.sources.TxLogMerge
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    (0L until 4L).map(x => (x, x)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    def upd(k: Long, v: Long): Unit =
      assert(TxLogMerge.merge(spark, t, xySchema,
        Seq((k, v)).toDF("x", "y"), Seq("x"),
        updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
        insertWhen = Some(lit(true)), nBuckets = 2, changeFeed = true) > 0L)
    upd(1L, 100L); upd(9L, 900L)
    val td = java.nio.file.Files.createTempDirectory("r13-cdf").toString
    def follow(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.sources.TxLogStreamSourceProvider].getName)
        .schema(xySchema).option("path", t).option("feed", "cdf")
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", s"$td/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$td/sink")
        }.start()
    val q = follow()
    try { q.processAllAvailable() } finally q.stop()
    def emitted() = spark.read.parquet(s"$td/sink")
      .collect().map(r => (r.getAs[Long]("_version"),
        r.getAs[String]("_change_type"), r.getAs[Long]("x"),
        r.getAs[Long]("y"))).sorted.toSeq
    assert(emitted() == Seq(
      (1L, "update_postimage", 1L, 100L), (1L, "update_preimage", 1L, 1L),
      (2L, "insert", 9L, 900L)))
    // restart picks up only NEW merges
    upd(2L, 200L)
    val q2 = follow()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(emitted().count(_._1 == 3L) == 2, "one pre + one post for v3")
    assert(emitted().size == 5, "no duplicates on restart")
    // a followed version with no feed (plain commit) is loud
    Seq((50L, 50L)).toDF("x", "y").coalesce(1).write.parquet(s"$t/extra")
    assert(TxLog.tryCommit(spark, t, 4L, Seq("extra"), Nil))
    val q3 = follow()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(e.getMessage.contains("change feed") ||
      Option(e.getCause).exists(_.getMessage.contains("change feed")))
    graft.operators.Checkpointing.deleteRecursively(td)
  }

  test("write-audit-publish: a failing audit deletes the stage and " +
      "leaves the table byte-identical; publishes retry the CAS under a " +
      "racing committer") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    val rules = Seq("y_nonneg" -> (col("y") >= 0L))
    assert(TxLog.writeAuditPublish(
      Seq((1L, 10L), (2L, 20L)).toDF("x", "y"), t, "a", rules) == 0L)
    // corrupt stage: refused with the per-rule count, nothing changes
    val e = intercept[IllegalStateException](TxLog.writeAuditPublish(
      Seq((3L, -1L), (4L, 40L), (5L, -5L)).toDF("x", "y"), t, "b", rules))
    assert(e.getMessage.contains("y_nonneg=2"))
    assert(TxLog.currentVersion(spark, t).contains(0L))
    assert(!fsOf(t).exists(new org.apache.hadoop.fs.Path(t, "b")),
      "the refused stage is deleted, not an invisible orphan")
    assert(TxLog.read(spark, t, xySchema).count() == 2L)
    // overwriting a LIVE dir name is refused before any byte moves
    val e2 = intercept[IllegalArgumentException](TxLog.writeAuditPublish(
      Seq((9L, 9L)).toDF("x", "y"), t, "a", rules))
    assert(e2.getMessage.contains("already LIVE"))
    // CAS retry under a racing committer: both land, no lost update
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      (1 to 6).foreach { i =>
        val fut = ex.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = TxLog.append(
            Seq((100L + i, i.toLong)).toDF("x", "y"), t, s"r$i")
        })
        TxLog.append(Seq((200L + i, i.toLong)).toDF("x", "y"), t, s"m$i")
        fut.get(120, java.util.concurrent.TimeUnit.SECONDS)
      }
    } finally ex.shutdown()
    assert(TxLog.read(spark, t, xySchema).count() == 2L + 12L)
    assert(TxLog.currentVersion(spark, t).contains(12L))
  }

  test("vacuumDerived: stale manifests and out-of-retention change " +
      "feeds are reclaimed; the survivors keep serving, the reclaimed " +
      "read as loud missing state") {
    import graft.sources.TxLogMerge
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    (0L until 3L).map(x => (x, x)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    TxLog.writeManifest(spark, t) // v0 manifest, soon stale
    (1 to 3).foreach { i =>
      assert(TxLogMerge.merge(spark, t, xySchema,
        Seq((i.toLong, i * 100L)).toDF("x", "y"), Seq("x"),
        updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
        insertWhen = Some(lit(true)), nBuckets = 2,
        changeFeed = true) == i.toLong)
    }
    TxLog.writeManifest(spark, t) // v3 — the live one
    val deleted = TxLog.vacuumDerived(spark, t, retainChangeVersions = 1)
    assert(deleted.sorted == Seq("_changes/v0000000001", "_changes/v0000000002",
      "_manifest/v0000000000"))
    // the live manifest and the retained feeds keep serving
    assert(TxLog.readViaManifest(spark, t, xySchema, Nil).count() == 4L)
    assert(TxLogMerge.readChangeFeed(spark, t, xySchema, 3L).count() == 1L,
      "v3 is the insert of key 3 — one change row")
    // the reclaimed feed reads as loud missing state
    val e = intercept[IllegalArgumentException](
      TxLogMerge.readChangeFeed(spark, t, xySchema, 1L))
    assert(e.getMessage.contains("change feed"))
    // idempotent re-run deletes nothing further
    assert(TxLog.vacuumDerived(spark, t, 1).isEmpty)
  }

  private def downXs(down: String): Seq[Long] =
    TxLog.read(spark, down, xySchema).collect().map(_.getLong(0)).sorted.toSeq

  test("TxLog streaming source: offsets = commit versions, paced by " +
      "maxVersionsPerTrigger, composing exactly-once into a downstream " +
      "TxLog sink — and a restart resumes mid-history without duplicates") {
    val up = freshTable()
    (0L to 3L).foreach(b =>
      TxLog.commitBatch(Seq((b, b)).toDF("x", "y"), up, b))
    val td = java.nio.file.Files.createTempDirectory("txlogsrc").toString
    val down = s"$td/down"
    def follow(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format(classOf[graft.sources.TxLogStreamSourceProvider].getName)
        .schema(xySchema).option("path", up)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", s"$td/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          TxLog.commitBatch(batch, down, id, appId = "ds")
        }
        .start()
    val q = follow()
    try {
      q.processAllAvailable()
      assert(downXs(down) == Seq(0L, 1L, 2L, 3L))
      // a LIVE append is picked up by the running stream
      TxLog.commitBatch(Seq((4L, 4L)).toDF("x", "y"), up, 4L)
      q.processAllAvailable()
      assert(downXs(down) == (0L to 4L).toSeq)
    } finally q.stop()
    // pacing: 1 commit-version per trigger → one downstream batch per
    // upstream version (versions 0..4 → downstream batches 0..4)
    val afterFirst = TxLog.currentVersion(spark, down).get
    assert(afterFirst == 4L,
      s"expected 5 paced downstream batches (v0..v4), head is v$afterFirst")
    // restart from the same checkpoint: only the NEW upstream commits
    // flow; the replayed last batch is absorbed by the sink's watermark
    (5L to 6L).foreach(b =>
      TxLog.commitBatch(Seq((b, b)).toDF("x", "y"), up, b))
    val q2 = follow()
    try {
      q2.processAllAvailable()
      assert(downXs(down) == (0L to 6L).toSeq, "no duplicates, no gaps")
    } finally q2.stop()
    assert(TxLog.currentVersion(spark, down).get == 6L)
  }

  test("TxLog streaming source: a fresh consumer on a checkpointed, " +
      "TRUNCATED upstream gets the snapshot as its first batch, then " +
      "follows the suffix") {
    val up = freshTable()
    (0L to 4L).foreach(b =>
      TxLog.commitBatch(Seq((b, b)).toDF("x", "y"), up, b))
    assert(TxLog.checkpoint(spark, up) == 4L)
    val fs = fsOf(up)
    (0 to 4).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(up, f"_log/$v%010d.json"), false))
    TxLog.commitBatch(Seq((5L, 5L)).toDF("x", "y"), up, 5L)
    val td = java.nio.file.Files.createTempDirectory("txlogsrc2").toString
    val down = s"$td/down"
    val q = spark.readStream
      .format(classOf[graft.sources.TxLogStreamSourceProvider].getName)
      .schema(xySchema).option("path", up).load()
      .writeStream.option("checkpointLocation", s"$td/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        TxLog.commitBatch(batch, down, id, appId = "ds")
      }
      .start()
    try {
      q.processAllAvailable()
      assert(downXs(down) == (0L to 5L).toSeq)
    } finally q.stop()
  }
}
