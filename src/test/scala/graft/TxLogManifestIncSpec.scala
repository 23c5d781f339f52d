package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.{col, lit}

/** Incremental manifest maintenance (r14 — VERDICT item 3): deriving
  * `_manifest/v<head>` from the previous manifest + the commit suffix
  * distributively — equivalence with the full rebuild across
  * interleaved appends / merges / DV merges / OPTIMIZE, checkpoint
  * (schema + txn) rows riding the artifact, loud remove-of-unknown,
  * and the O(suffix)-driver claim proven by running under a
  * maxLiveAdds bound that makes the full walk throw. */
class TxLogManifestIncSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogminc").toString + "/t"

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def manifestRows(t: String): Set[(String, String, Option[String])] =
    TxLog.manifestDf(spark, t).collect().map(r =>
      (r.getAs[String]("kind"),
        Option(r.getAs[String]("name")).getOrElse(
          Option(r.getAs[String]("app")).getOrElse("")) +
          Option(r.getAs[String]("ddl")).getOrElse(""),
        Option(r.getAs[String]("dv")))).toSet

  test("incremental ≡ full rebuild across interleaved appends, merges, " +
      "DV merges, and OPTIMIZE; reads through it stay exact") {
    val t = freshTable()
    TxLog.append((0L until 400L).map(x => (x, x)).toDF("x", "y"), t, "seed")
    assert(TxLog.writeManifest(spark, t) == 0L)
    // v1: bucketizing merge, v2: append, v3: DV merge, v4: optimize
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((1L, 11L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      nBuckets = 4) == 1L)
    assert(TxLog.writeManifestIncremental(spark, t) == 1L)
    // read the incremental rows first, then rebuild full in place and
    // compare — same slot, so no path games
    val full1 = manifestRows(t)
    assert(TxLog.writeManifest(spark, t) == 1L) // overwrite with full
    assert(manifestRows(t) == full1,
      "incremental v1 manifest must equal the full rebuild")
    TxLog.append(Seq((900L, 9L)).toDF("x", "y"), t, "extra")
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((2L, 22L), (901L, 91L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      insertWhen = Some(lit(true)), dvThreshold = 0.9) == 3L)
    assert(TxLog.optimize(spark, t, Some(xySchema)).contains(4L))
    assert(TxLog.writeManifestIncremental(spark, t) == 4L)
    val inc4 = manifestRows(t)
    assert(TxLog.writeManifest(spark, t) == 4L)
    assert(manifestRows(t) == inc4,
      "incremental v4 manifest must equal the full rebuild after a " +
        "remove-heavy suffix (merge + DV re-add + optimize)")
    // reads through the incrementally-built artifact stay exact
    assert(TxLog.writeManifestIncremental(spark, t) == 4L) // no-op
    val got = TxLog.readViaManifest(spark, t, xySchema, Nil)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = TxLog.read(spark, t, xySchema)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
  }

  test("checkpoint rows ride the manifest: the governing schema and " +
      "every producer watermark are queryable as a DataFrame") {
    val t = freshTable()
    (0L to 2L).foreach(b =>
      TxLog.commitBatch(Seq((b, b)).toDF("x", "y"), t, b,
        appId = "prodA"))
    assert(TxLog.tryCommitActions(spark, t, 3L, Nil, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@none")))
    assert(TxLog.writeManifest(spark, t) == 3L)
    val m = TxLog.manifestDf(spark, t)
    assert(m.filter(col("kind") === "schema").collect()
      .map(_.getAs[String]("ddl")).toSeq == Seq(xySchema.toDDL))
    assert(m.filter(col("kind") === "txn")
      .select("app", "ver").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("prodA", 2L)))
    // and the incremental path folds NEW watermarks + schema in
    TxLog.commitBatch(Seq((9L, 9L)).toDF("x", "y"), t, 3L, appId = "prodA")
    assert(TxLog.writeManifestIncremental(spark, t) == 4L)
    val m2 = TxLog.manifestDf(spark, t)
    assert(m2.filter(col("kind") === "txn").select("app", "ver").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("prodA", 3L)))
    assert(m2.filter(col("kind") === "add").count() == 4L)
  }

  test("O(suffix) driver cost: under a maxLiveAdds bound that makes the " +
      "full walk THROW, the incremental update still maintains a " +
      "many-thousand-file manifest") {
    val t = freshTable()
    // 3000 metadata-only adds (the manifest job never opens data dirs)
    val adds0 = (0 until 3000).map(i => TxLog.AddFile(f"f$i%05d",
      Map("x" -> (i.toString, (i + 1).toString))))
    assert(TxLog.tryCommitActions(spark, t, 0L, adds0, Nil))
    assert(TxLog.writeManifest(spark, t) == 0L)
    spark.conf.set("graft.txlog.maxLiveAdds", "100")
    try {
      // the full path materializes the live set on the driver: loud
      val e = intercept[IllegalArgumentException](
        TxLog.writeManifest(spark, t))
      assert(e.getMessage.contains("maxLiveAdds"))
      // the incremental path never does: a suffix of 2 commits over a
      // 3000-file table maintains the manifest under the same bound
      assert(TxLog.tryCommitActions(spark, t, 1L,
        Seq(TxLog.AddFile("g1")), Seq("f00000", "f00001")))
      assert(TxLog.tryCommitActions(spark, t, 2L,
        Seq(TxLog.AddFile("g2")), Seq("g1")))
      assert(TxLog.writeManifestIncremental(spark, t) == 2L)
      val m = TxLog.manifestDf(spark, t)
      assert(m.filter(col("kind") === "add").count() == 2999L,
        "3000 - 2 removed + 2 added - 1 removed")
      assert(m.filter(col("name") === "g2").count() == 1L)
      assert(m.filter(col("name").isin("f00000", "f00001", "g1")).count()
        == 0L)
    } finally spark.conf.set("graft.txlog.maxLiveAdds", "1000000")
  }

  test("remove-of-unknown in the suffix is loud, distributively") {
    val t = freshTable()
    assert(TxLog.tryCommitActions(spark, t, 0L,
      Seq(TxLog.AddFile("a")), Nil))
    assert(TxLog.writeManifest(spark, t) == 0L)
    // hand-write a corrupt commit removing a name never added
    assert(TxLog.tryCommitActions(spark, t, 1L,
      Seq(TxLog.AddFile("b")), Seq("ghost")))
    val e = intercept[IllegalArgumentException](
      TxLog.writeManifestIncremental(spark, t))
    assert(e.getMessage.contains("removes unknown"))
  }
}
