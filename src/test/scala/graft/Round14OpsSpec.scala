package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.{col, lit}

/** The r14 TxLog hardening, per ADVICE r13: string pruning compares
  * UTF-8 bytes (not UTF-16 code units), manifest decimal pruning is
  * conservative under try_cast rounding, writeAuditPublish re-checks
  * name liveness at every CAS attempt (two same-name publishes cannot
  * wedge the table), the rewrite-dir heuristic matches the actual
  * rewrite grammars (a user dir named "metrics…" no longer disables the
  * foreign-table guard), and the change feed is TIED TO ITS COMMIT by a
  * `{"cdf":…}` marker — an orphaned feed dir from a lost commit race is
  * refused, and the feed goes UNIFIED (appends serve all-insert,
  * OPTIMIZE serves empty, unmarked commits stay loud). */
class Round14OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogr14").toString + "/t"

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // --------------------------------------------------------------------
  // ADVICE 2: string pruning order = UTF-8 bytes, not UTF-16 code units
  // --------------------------------------------------------------------

  test("string pruning compares UTF-8 bytes: a supplementary-plane " +
      "envelope overlapping the bound is KEPT (UTF-16 code-unit order " +
      "would wrongly drop it), and genuinely disjoint files still prune") {
    val emoji = "😀" // U+1F600, UTF-8 F0 9F 98 80
    val priv = ""        // U+E000,  UTF-8 EE 80 80
    // file contains [U+E000 .. U+1F600]; bound is exactly U+1F600:
    // true (code-point / UTF-8) order overlaps at the file max. Under
    // UTF-16 code units the file MIN (0xE000) sorts above the bound's
    // first unit (0xD83D), reading the file as entirely-above — a
    // wrong prune.
    val boundary = TxLog.AddFile("boundary", Map("s" -> (priv, emoji)))
    assert(TxLog.pruneAdds(Seq(boundary),
      Seq(TxLog.SkipRangeString("s", emoji, emoji))).map(_.name) ==
      Seq("boundary"),
      "a file whose UTF-8 max equals the bound's lo must be kept")
    // symmetric case: bound [U+E000, U+E000], file [U+1F600, U+1F600] —
    // disjoint in true UTF-8 order (file above bound), prune
    val above = TxLog.AddFile("above", Map("s" -> (emoji, emoji)))
    assert(TxLog.pruneAdds(Seq(above),
      Seq(TxLog.SkipRangeString("s", priv, priv))).isEmpty,
      "a file strictly above the bound in UTF-8 order prunes")
    // and the prune decision agrees with Spark's own string comparison
    // end-to-end: rows with the supplementary-plane value survive a
    // pruned read under the bound that keeps their file
    val t = freshTable()
    Seq((1L, emoji), (2L, priv)).toDF("x", "s")
      .coalesce(1).write.parquet(s"$t/d0")
    val add = TxLog.AddFile("d0",
      TxLog.statsOf(spark.read.parquet(s"$t/d0"), Seq("s")))
    assert(TxLog.tryCommitActions(spark, t, 0L, Seq(add), Nil))
    val got = TxLog.read(spark, t,
        StructType.fromDDL("x BIGINT, s STRING"),
        None, Seq(TxLog.SkipRangeString("s", emoji, emoji)))
      .filter(col("s").between(emoji, emoji))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "pruning must not drop the emoji row's file")
  }

  // --------------------------------------------------------------------
  // ADVICE 5: manifest decimal pruning is conservative under rounding
  // --------------------------------------------------------------------

  test("manifest decimal pruning: an envelope whose min would ROUND UP " +
      "past the bound under the cast is kept (conservative), agreeing " +
      "with the driver path; truly disjoint files still prune") {
    val t = freshTable()
    // boundary file: min has 19 fractional digits and rounds UP to 5.0
    // at any scale ≤ 18 — the query hi sits between the true min and
    // its rounded image, so a naive cast-compare would wrongly prune
    Seq((1L, "in")).toDF("x", "tag").coalesce(1).write.parquet(s"$t/edge")
    Seq((2L, "out")).toDF("x", "tag").coalesce(1).write.parquet(s"$t/far")
    assert(TxLog.tryCommitActions(spark, t, 0L, Seq(
      TxLog.AddFile("edge", Map("d" ->
        ("4.9999999999999999996", "6.0"))),
      TxLog.AddFile("far", Map("d" -> ("100.1", "200.2")))), Nil))
    TxLog.writeManifest(spark, t)
    val sch = StructType.fromDDL("x BIGINT, tag STRING")
    val skip = Seq(TxLog.SkipRangeDecimal("d",
      BigDecimal("1.0"), BigDecimal("4.9999999999999999997")))
    // driver path keeps edge (exact BigDecimal compare), drops far
    assert(TxLog.pruneAdds(TxLog.liveAdds(spark, t), skip)
      .map(_.name) == Seq("edge"))
    // manifest path must agree: edge's rows survive, far's are pruned
    val viaManifest = TxLog.readViaManifest(spark, t, sch, skip)
    assert(viaManifest.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(viaManifest.inputFiles.forall(_.contains("/edge/")),
      "the provably-disjoint file must still prune through the manifest")
  }

  // --------------------------------------------------------------------
  // ADVICE 3: same-name publish race cannot wedge the table
  // --------------------------------------------------------------------

  test("writeAuditPublish re-checks liveness at every CAS attempt: two " +
      "concurrent publishes of one name → exactly one wins, the loser " +
      "is loud, and the table never wedges") {
    val t = freshTable()
    TxLog.append(Seq((0L, 0L)).toDF("x", "y"), t, "seed")
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    var wins = 0
    try {
      (1 to 8).foreach { i =>
        val name = s"n$i"
        // private staging + atomic name claim: exactly ONE publish of a
        // name succeeds, the loser is loud ("claimed"/"LIVE"), and the
        // winner's bytes are never mixed with the loser's. The r13
        // wedge — both committing so every later replay throws
        // add-of-already-live — and the r14-found byte interleave are
        // both impossible by construction.
        def attempt(x: Long): Boolean =
          try { TxLog.append(Seq((x, x)).toDF("x", "y").coalesce(1),
            t, name); true }
          catch { case e: IllegalArgumentException =>
            assert(e.getMessage.contains("claimed") ||
              e.getMessage.contains("LIVE")); false }
        val other = ex.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = attempt(100L + i)
        })
        val mine = attempt(200L + i)
        val theirs = other.get(120, java.util.concurrent.TimeUnit.SECONDS)
        assert(mine ^ theirs,
          s"round $i: exactly one publish of '$name' must win " +
            s"(mine=$mine theirs=$theirs)")
        wins += 1
        // the winner's bytes landed intact: one row, the winner's marker
        val winnerX = if (mine) 200L + i else 100L + i
        val rows = TxLog.read(spark, t, xySchema)
          .filter(col("x").isin(100L + i, 200L + i))
          .collect().map(_.getLong(0)).toSeq
        assert(rows == Seq(winnerX),
          s"round $i: the published dir must hold exactly the winner's row")
        assert(TxLog.liveAdds(spark, t).map(_.name).count(_ == name) == 1)
        assert(TxLog.read(spark, t, xySchema).count() == 1L + wins)
      }
    } finally ex.shutdown()
  }

  // --------------------------------------------------------------------
  // VERDICT 6: incremental ANN graph maintenance — the recall envelope
  // and the O(batch) cost receipt
  // --------------------------------------------------------------------

  test("knn_graph_extend: the extended graph overlaps the full rebuild " +
      "above the envelope floor, at a small fraction of the rebuild's " +
      "pair mass") {
    val row = graft.queries.VectorQueries
      .queries("knn_graph_extend")(spark, sf).head()
    assert(row.getAs[Double]("overlap") >= 0.95,
      s"recall envelope: overlap ${row.getAs[Double]("overlap")} < 0.95")
    val scored = row.getAs[Long]("n_scored_extend")
    val rebuild = row.getAs[Long]("n_rebuild_pairs")
    assert(scored * 3 < rebuild,
      s"O(batch) receipt: extension scored $scored pairs, a rebuild " +
        s"pays $rebuild — the extend verb must be several times cheaper")
    assert(row.getAs[Long]("n_new") > 0 && row.getAs[Long]("n_edges") > 0)
  }

  // --------------------------------------------------------------------
  // ADVICE 4: rewrite-dir heuristic matches the actual rewrite grammars
  // --------------------------------------------------------------------

  test("subsumed-replay guard: a user data dir named 'metrics…' does " +
      "NOT read as a compaction rewrite — the foreign-table check " +
      "stays armed") {
    // the r13 guard treated any live dir starting with "m" as a
    // rewrite; this table's dirs start with "metrics" and must still
    // trip the misconfiguration loudness after checkpoint truncation
    val t = freshTable()
    (0 to 1).foreach { v =>
      Seq((v.toLong, v.toLong)).toDF("x", "y").coalesce(1)
        .write.parquet(s"$t/metrics$v")
      assert(TxLog.tryCommitActions(spark, t, v.toLong,
        Seq(TxLog.AddFile(s"metrics$v")), Nil,
        txns = Seq("stream" -> v.toLong)))
    }
    assert(TxLog.checkpoint(spark, t) == 1L)
    val fs = fsOf(t)
    (0 to 1).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(t, f"_log/$v%010d.json"), false))
    val e = intercept[IllegalArgumentException](
      TxLog.commitBatch(Seq((9L, 9L)).toDF("x", "y"), t, 0L))
    assert(e.getMessage.contains("foreign table"),
      "dirs named metrics* must not silently disable the guard")
  }

  // --------------------------------------------------------------------
  // ADVICE 1 + VERDICT 5: the change feed is tied to its commit, and
  // the feed contract is UNIFIED across commit kinds
  // --------------------------------------------------------------------

  test("change feed is tied to its commit: an orphaned _changes dir at " +
      "a version whose commit carries no marker is REFUSED, never served") {
    val t = freshTable()
    (0L until 4L).map(x => (x, x)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    // simulate a lost commit race: a writer staged _changes/v1 but its
    // CAS lost and this plain commit took version 1 instead
    Seq((1L, 1L, "insert")).toDF("x", "y", "_change_type")
      .coalesce(1).write.parquet(s"$t/_changes/v0000000001")
    Seq((50L, 50L)).toDF("x", "y").coalesce(1).write.parquet(s"$t/extra")
    assert(TxLog.tryCommit(spark, t, 1L, Seq("extra"), Nil))
    val e = intercept[IllegalArgumentException](
      TxLogMerge.readChangeFeed(spark, t, xySchema, 1L))
    assert(e.getMessage.contains("change feed"),
      "an orphaned feed dir must read as no-feed, not as v1's changes")
  }

  test("merge CAS loss deletes the staged feed: the loser's _changes " +
      "dir does not survive its lost commit") {
    val t = freshTable()
    (0L until 4L).map(x => (x, x)).toDF("x", "y")
      .coalesce(1).write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    // occupy version 1 AFTER the merge has planned against head 0: the
    // merge's CAS must lose. Deterministic interleave via a source DF
    // whose first action (the ambiguity-guard collect) runs before the
    // occupying commit, so we pre-commit v1 here and call merge after —
    // merge plans at head 1 then... instead, simplest determinism:
    // plant v1 FIRST, then call merge with a stale planState by racing
    // is not needed — merge re-reads the head itself. So instead prove
    // the contract the other way: a merge that LOSES to a concurrent
    // writer mid-flight cleans up. We interleave with a real thread.
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      var lost = false
      var round = 0
      while (!lost && round < 12) {
        round += 1
        val head = TxLog.currentVersion(spark, t).get
        val fut = ex.submit(new java.lang.Runnable {
          def run(): Unit = {
            // occupy head+1 while the merge is rewriting
            Seq((900L + round, 0L)).toDF("x", "y").coalesce(1)
              .write.parquet(s"$t/occ$round")
            TxLog.tryCommitActions(spark, t, head + 1,
              Seq(TxLog.AddFile(s"occ$round")), Nil)
            ()
          }
        })
        try {
          TxLogMerge.merge(spark, t, xySchema,
            Seq((1L, 100L * round)).toDF("x", "y"), Seq("x"),
            updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
            nBuckets = 2, changeFeed = true)
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("another writer") =>
            lost = true
            val feed = new org.apache.hadoop.fs.Path(t,
              f"_changes/v${head + 1}%010d")
            assert(!fsOf(t).exists(feed),
              "the CAS loser must delete its staged feed dir")
        }
        fut.get(120, java.util.concurrent.TimeUnit.SECONDS)
      }
      assert(lost, "12 rounds without a lost CAS — interleave too lucky")
    } finally ex.shutdown()
  }

  test("unified change feed: appends serve all-insert, OPTIMIZE serves " +
      "empty, merges serve their recorded images, and a follower " +
      "reconstructs the head from the seed + feeds alone") {
    val t = freshTable()
    // v0: seed append (marked @adds)
    TxLog.append((0L until 6L).map(x => (x, x)).toDF("x", "y"), t, "seed")
    // v1: merge — delete x=0, update x=1 → y=100, insert x=10
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((0L, 0L), (1L, 100L), (10L, 10L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      deleteWhen = Some(col("x") <=> 0L),
      insertWhen = Some(lit(true)), nBuckets = 2, changeFeed = true) == 1L)
    // v2: append two more rows
    TxLog.append(Seq((20L, 20L), (21L, 21L)).toDF("x", "y"), t, "more")
    // v3: OPTIMIZE — layout only, empty feed
    assert(TxLog.optimize(spark, t, Some(xySchema)).contains(3L))
    // v4: second merge — update x=20 → y=2000
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((20L, 2000L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      nBuckets = 2, changeFeed = true) == 4L)
    // per-version contracts
    assert(TxLogMerge.readChangeFeed(spark, t, xySchema, 0L)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      (0L until 6L).map(x => (x, "insert")))
    assert(TxLogMerge.readChangeFeed(spark, t, xySchema, 2L)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 21L))
    assert(TxLogMerge.readChangeFeed(spark, t, xySchema, 3L).isEmpty,
      "a layout-only commit has an EMPTY feed, not a loud one")
    // follower reconstruction: apply every feed in version order onto
    // nothing — the unified feed starts at the v0 insert set, so the
    // feeds ALONE rebuild the head
    val feeds = (0L to 4L).map(v =>
      TxLogMerge.readChangeFeed(spark, t, xySchema, v)
        .withColumn("_v", lit(v)))
      .reduce(_ unionByName _)
    val applied = feeds
      .filter(col("_change_type") =!= "update_preimage")
      .groupBy("x")
      .agg(org.apache.spark.sql.functions.expr(
        "max_by(struct(y, _change_type), _v)").as("c"))
      .filter(col("c._change_type") =!= "delete")
      .select(col("x"), col("c.y").as("y"))
    val head = TxLog.read(spark, t, xySchema)
    assert(applied.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq ==
      head.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "feeds alone must rebuild the head snapshot")
  }
}
