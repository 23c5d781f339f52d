package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.{col, lit}

/** Round-15 hardening of the r14 ADVICE items — each test pins the
  * exact failure the advisor found:
  *  1. IN-list pushdown over DATE / BOOLEAN columns threw
  *     NumberFormatException at plan time (anyOrd's BigDecimal
  *     fallback) — valid queries must plan and answer correctly;
  *  2. SkipPartition rendering for non-canonical types (double) could
  *     silently prune files whose rows match — those types now rely on
  *     the typed stats envelope + residual filter only;
  *  3. a user table whose schema contains `leaf`/`pos` columns made
  *     the DV anti-join ambiguous — every read of a DV table broke;
  *  4. vacuumDerived deleted a vector superseded after the horizon but
  *     still referenced by a retained version's live adds — in-window
  *     time travel failed on the missing DV path. */
class Round15OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogr15").toString + "/t"

  test("SQL IN-list over a DATE column plans (no plan-time throw), " +
      "prunes disjoint files via the date envelope, and answers " +
      "exactly") {
    val t = freshTable()
    val schema = StructType.fromDDL("d DATE, x BIGINT")
    val rows = (1 to 20).map(i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), i.toLong))
    val adds = Seq(0, 1).map { half =>
      val nm = s"h$half"
      rows.filter(r => (r._2 > 10) == (half == 1)).toDF("d", "x")
        .coalesce(1).write.parquet(s"$t/$nm")
      TxLog.AddFile(nm,
        TxLog.statsOf(spark.read.parquet(s"$t/$nm"), Seq("d")))
    }
    assert(TxLog.tryCommitActions(spark, t, 0L, adds, Nil,
      schemaDdl = Some(schema.toDDL), cdf = Some("@adds")))
    graft.sources.TxLogScanTelemetry.lastPlanned = None
    val got = spark.read.format("txlog").load(t)
      .filter(col("d").isin(
        java.sql.Date.valueOf("2024-01-03"),
        java.sql.Date.valueOf("2024-01-05")))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(got == Seq(3L, 5L))
    // the hull [01-03, 01-05] is disjoint from h1's [01-11, 01-20]
    assert(graft.sources.TxLogScanTelemetry.lastPlanned.contains((1, 2)),
      "the date hull must prune the disjoint file")
  }

  test("SQL IN-list / equality over a BOOLEAN column plans (the old " +
      "BigDecimal ordering threw NumberFormatException) and answers " +
      "exactly with zero wrong pruning") {
    val t = freshTable()
    val schema = StructType.fromDDL("flag BOOLEAN, x BIGINT")
    (1 to 10).map(i => (i % 2 == 0, i.toLong)).toDF("flag", "x")
      .coalesce(1).write.parquet(s"$t/d0")
    assert(TxLog.tryCommitActions(spark, t, 0L,
      Seq(TxLog.AddFile("d0",
        TxLog.statsOf(spark.read.parquet(s"$t/d0"), Seq("flag")))), Nil,
      schemaDdl = Some(schema.toDDL), cdf = Some("@adds")))
    val df = spark.read.format("txlog").load(t)
    assert(df.filter(col("flag").isin(true)).count() == 5L)
    assert(df.filter(col("flag") === false).count() == 5L)
  }

  test("a pushed long equality over a DOUBLE column must NOT silently " +
      "prune a file whose recorded partition rendering differs " +
      "('1.0' vs '1') — non-canonical types skip partition membership " +
      "and keep the stats envelope + residual") {
    val t = freshTable()
    val schema = StructType.fromDDL("v DOUBLE, x BIGINT")
    Seq((1.0d, 10L), (2.0d, 20L)).toDF("v", "x")
      .coalesce(1).write.parquet(s"$t/d0")
    // the writer recorded the partition value the way doubles render
    assert(TxLog.tryCommitActions(spark, t, 0L,
      Seq(TxLog.AddFile("d0",
        TxLog.statsOf(spark.read.parquet(s"$t/d0"), Seq("v")),
        part = Map("v" -> "1.0"))), Nil,
      schemaDdl = Some(schema.toDDL), cdf = Some("@adds")))
    // an equality arriving as a long literal: rendering drift ("1" vs
    // "1.0") must not drop the file — the row IS there
    val got = spark.read.format("txlog").load(t)
      .filter(col("v") === 1.0d).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(10L), s"rendering drift pruned a matching file: $got")
    val in = spark.read.format("txlog").load(t)
      .filter(col("v").isin(1.0d, 3.0d)).collect().map(_.getLong(1)).toSeq
    assert(in == Seq(10L))
  }

  test("a DV-carrying table whose schema contains columns named " +
      "`leaf` and `pos` still reads (the anti-join keys are prefixed, " +
      "never ambiguous)") {
    val t = freshTable()
    val schema = StructType.fromDDL("k BIGINT, leaf STRING, pos BIGINT")
    (0L until 400L).map(k => (k, s"leaf$k", k * 2))
      .toDF("k", "leaf", "pos").write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    // bucketize, then a sparse DV merge deleting two keys
    assert(TxLogMerge.merge(spark, t, schema,
      Seq((0L, "leaf0", 0L)).toDF("k", "leaf", "pos"), Seq("k"),
      updateSet = Map("pos" -> col(s"${TxLogMerge.Src}pos")),
      nBuckets = 2) == 1L)
    assert(TxLogMerge.merge(spark, t, schema,
      Seq((5L, "x", 0L), (9L, "x", 0L)).toDF("k", "leaf", "pos"), Seq("k"),
      deleteWhen = Some(lit(true)), dvThreshold = 0.5) == 2L)
    assert(TxLog.liveAdds(spark, t).exists(_.dv.isDefined),
      "the sparse merge must take the DV path")
    val got = TxLog.read(spark, t, schema)
    assert(got.count() == 398L)
    assert(got.filter(col("k").isin(5L, 9L)).isEmpty)
    assert(got.filter(col("k") === 7L).head().getString(1) == "leaf7")
  }

  test("knn_graph_retract: tombstone + touched-only repair EXACTLY " +
      "equals the rebuild without the dropped vectors (overlap 1.0 — " +
      "a mathematical property, not a mirrored formula: dropping only " +
      "removes candidates, so untouched top-3s are already rebuild " +
      "top-3s), at repair work strictly under the rebuild's pair mass") {
    val r = SparkEntry.queries("knn_graph_retract")(spark, sf).head()
    assert(r.getAs[Long]("n_dropped") > 0 && r.getAs[Long]("n_touched") > 0,
      "the drop stratum and touched set must be non-empty at sf0.001")
    assert(r.getAs[Double]("overlap") == 1.0)
    assert(r.getAs[Long]("n_match") == r.getAs[Long]("n_edges"))
    assert(r.getAs[Long]("n_scored_repair") <
      r.getAs[Long]("n_rebuild_pairs"),
      "repair must cost strictly less cosine work than the rebuild")
  }

  test("time-based vacuum: dry-run reports dirs/bytes/versions and " +
      "changes NOTHING; the real run deletes exactly the report, " +
      "time travel past the horizon is loud, retained versions read") {
    val t = freshTable()
    val schema = StructType.fromDDL("x BIGINT")
    // v0..v3: four one-dir commits, then v4 optimizes (supersedes all)
    (0 to 3).foreach { i =>
      Seq(i.toLong).toDF("x").coalesce(1).write.parquet(s"$t/d$i")
      assert(TxLog.tryCommitActions(spark, t, i.toLong,
        Seq(TxLog.AddFile(s"d$i")), Nil,
        schemaDdl = if (i == 0) Some(schema.toDDL) else None,
        cdf = Some("@adds")))
    }
    assert(TxLog.optimize(spark, t, Some(schema)).contains(4L))
    // stamp commit times: v0..v2 at t=1000, v3..v4 at t=2000000000000
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 to 4).foreach { v =>
      f.setTimes(new org.apache.hadoop.fs.Path(t, f"_log/$v%010d.json"),
        if (v <= 2) 1000L else 2000000000000L, -1)
    }
    val dry = TxLog.vacuumOlderThan(spark, t, olderThanMs = 1000000L,
      dryRun = true)
    assert(dry.dryRun && dry.horizon == 3L)
    assert(dry.versionsAffected == Seq(0L, 1L, 2L))
    // d0..d2 are not live at any version >= 3 … but v3's live set is
    // d0..d3, so NOTHING pre-v3 is reclaimable except nothing; the
    // optimize at v4 superseded d0..d3 — live at v3 keeps them. Only
    // dirs live at NO retained version go: none here yet.
    assert(dry.dirs.isEmpty && dry.bytes == 0L)
    // cutoff ABOVE every commit: only the head is retained — d0..d3 go
    val dry2 = TxLog.vacuumOlderThan(spark, t,
      olderThanMs = 3000000000000L, dryRun = true)
    assert(dry2.horizon == 4L && dry2.dirs == Seq("d0", "d1", "d2", "d3")
      && dry2.bytes > 0L)
    // dry-run changed nothing: v0 still reads
    assert(TxLog.read(spark, t, schema, Some(0L)).count() == 1L)
    val real = TxLog.vacuumOlderThan(spark, t,
      olderThanMs = 3000000000000L)
    assert(!real.dryRun && real.dirs == dry2.dirs)
    assert(TxLog.read(spark, t, schema).count() == 4L, "head intact")
    intercept[Exception] { // time travel past the horizon is loud
      TxLog.read(spark, t, schema, Some(1L)).count()
    }
  }

  test("vacuumDerived keeps a superseded vector that a RETAINED " +
      "version's live adds still reference — in-window time travel " +
      "reads; a pre-horizon-only vector is reclaimed") {
    val t = freshTable()
    val schema = StructType.fromDDL("k BIGINT, y BIGINT")
    (0L until 400L).map(k => (k, k)).toDF("k", "y").write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    assert(TxLogMerge.merge(spark, t, schema,
      Seq((0L, 0L)).toDF("k", "y"), Seq("k"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      nBuckets = 2) == 1L)
    // v2: DV merge (vector _dv/v2 born) — deletes k=5
    assert(TxLogMerge.merge(spark, t, schema,
      Seq((5L, 0L)).toDF("k", "y"), Seq("k"),
      deleteWhen = Some(lit(true)), dvThreshold = 0.5) == 2L)
    // v3..v6: four more DV merges, each superseding the prior vector
    (0 until 4).foreach { i =>
      assert(TxLogMerge.merge(spark, t, schema,
        Seq((10L + i, 0L)).toDF("k", "y"), Seq("k"),
        deleteWhen = Some(lit(true)), dvThreshold = 0.5) == 3L + i)
    }
    // retention horizon = head(6) − 3 = 3: _dv/v2 was superseded at v3
    // (post-horizon) BUT version 3's live adds reference _dv/v3 …
    // version 4 references _dv/v4 etc.; the v3 snapshot (>= horizon)
    // must stay readable, so _dv/v3 must survive even though the head
    // references only _dv/v6. _dv/v2 is referenced by NO version >= 3
    // and goes.
    val deleted = TxLog.vacuumDerived(spark, t, retainChangeVersions = 3)
    assert(deleted.exists(_.startsWith("_dv/v0000000002")),
      s"the pre-horizon-only vector must be reclaimed, got $deleted")
    assert(!deleted.exists(_.startsWith("_dv/v0000000003")),
      s"a vector referenced by the retained v3 snapshot must survive, " +
        s"got $deleted")
    // the retained snapshot reads — and still excludes the v3 deletes
    val v3 = TxLog.read(spark, t, schema, Some(3L))
    assert(v3.count() == 398L)
    assert(v3.filter(col("k").isin(5L, 10L)).isEmpty)
  }
}
