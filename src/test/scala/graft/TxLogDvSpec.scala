package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.{col, lit}

/** Deletion vectors / merge-on-read (r14 — VERDICT item 2): a merge
  * whose per-bucket touched fraction is at-or-below the threshold
  * writes a deletion vector + a small delta dir instead of rewriting
  * the bucket; reads (driver, manifest, SQL) apply the vector; OPTIMIZE
  * folds it; copy-on-write and merge-on-read interleave freely and
  * always agree. */
class TxLogDvSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogdv").toString + "/t"

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirBytes(t: String, d: String): Long =
    fsOf(t).getContentSummary(new org.apache.hadoop.fs.Path(t, d)).getLength

  /** A bucketized table of n rows (x, y = 10x), nb buckets. */
  private def seeded(n: Long, nb: Int): String = {
    val t = freshTable()
    (0L until n).map(x => (x, x * 10)).toDF("x", "y")
      .write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    // establishing merge: bucketize via a no-op-ish update of one key
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((0L, 0L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      nBuckets = nb) == 1L)
    t
  }

  private def state(t: String, asOf: Option[Long] = None): Seq[(Long, Long)] =
    TxLog.read(spark, t, xySchema, asOf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("a small-touch merge takes the DV path: old bucket dirs are " +
      "RE-ADDED with a vector (not rewritten), the commit's new bytes " +
      "are O(changed rows), and the state equals the copy-on-write " +
      "twin's at every step") {
    val n = 4000L
    val (tDv, tCow) = (seeded(n, 4), seeded(n, 4))
    // identical merge spec on both tables: delete x=7, update x=1000 →
    // y=-1, insert x=n+5
    def run(t: String, thr: Double): Long =
      TxLogMerge.merge(spark, t, xySchema,
        Seq((7L, 0L), (1000L, -1L), (n + 5L, 55L)).toDF("x", "y"),
        Seq("x"),
        updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
        deleteWhen = Some(col("x") <=> 7L),
        insertWhen = Some(lit(true)),
        changeFeed = true, dvThreshold = thr)
    assert(run(tDv, 0.5) == 2L)
    assert(run(tCow, 0.0) == 2L)
    assert(state(tDv) == state(tCow), "DV ≡ copy-on-write state")
    // the DV table re-added its touched bucket dirs (same names, now
    // carrying vectors); the COW table rewrote them (fresh mrg2 names)
    val dvAdds = TxLog.liveAdds(spark, tDv)
    val vectored = dvAdds.filter(_.dv.isDefined)
    assert(vectored.nonEmpty, "the touched buckets must carry vectors")
    assert(vectored.forall(_.name.startsWith("mrg0000000001/")),
      "vectored dirs are the ORIGINAL bucket dirs, re-added not rewritten")
    // O(changed rows): the commit's new bytes (delta dirs + vectors)
    // are a small fraction of one bucket's bytes
    val deltaBytes = dirBytes(tDv, "mrg0000000002") + dirBytes(tDv, "_dv")
    val bucketBytes = dirBytes(tDv, "mrg0000000001")
    assert(deltaBytes * 4 < bucketBytes,
      s"delta+vector bytes ($deltaBytes) must be well under the " +
        s"touched data ($bucketBytes) — merge-on-read, not copy-on-write")
    // time travel: v1 still reads the pre-merge state (vectors are
    // version-scoped via the re-add)
    assert(state(tDv, Some(1L)) == state(tCow, Some(1L)))
    // the change feeds agree too
    def feed(t: String) = TxLogMerge.readChangeFeed(spark, t, xySchema, 2L)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(feed(tDv) == feed(tCow))
  }

  test("DV merges chain: a second small merge on the same bucket " +
      "supersedes the vector (union), reads never resurrect rows, and " +
      "the manifest path agrees with the driver path") {
    val t = seeded(2000L, 2)
    def upd(k: Long, v: Long): Long =
      TxLogMerge.merge(spark, t, xySchema, Seq((k, v)).toDF("x", "y"),
        Seq("x"), updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
        dvThreshold = 0.5)
    assert(upd(10L, 111L) == 2L)
    assert(upd(10L, 222L) == 3L) // same key again: supersede the vector
    assert(upd(11L, 333L) == 4L) // same bucket? different key
    val got = state(t)
    assert(got.count(_._1 == 10L) == 1 && got.find(_._1 == 10L).get._2 == 222L,
      "exactly one surviving image of a twice-updated key")
    assert(got.find(_._1 == 11L).get._2 == 333L)
    assert(got.size == 2000, "no net row-count drift from updates")
    // manifest path applies vectors identically
    TxLog.writeManifest(spark, t)
    val viaM = TxLog.readViaManifest(spark, t, xySchema, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaM == got, "manifest reads must be DV-aware")
    // SQL front door applies vectors identically (schema from a commit)
    assert(TxLog.tryCommitActions(spark, t,
      TxLog.currentVersion(spark, t).get + 1, Nil, Nil,
      schemaDdl = Some(xySchema.toDDL), cdf = Some("@none")))
    val viaSql = spark.read.format("txlog").load(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaSql == got, "SQL reads must be DV-aware")
  }

  test("OPTIMIZE folds deletion vectors: contents identical, no live " +
      "vector afterwards, and vacuumDerived reclaims the orphaned " +
      "vector files") {
    val t = seeded(1000L, 2)
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((5L, -5L), (6L, 0L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      deleteWhen = Some(col("x") <=> 6L), dvThreshold = 0.5) == 2L)
    val before = state(t)
    assert(before.size == 999 && before.find(_._1 == 5L).get._2 == -5L)
    assert(TxLog.liveAdds(spark, t).exists(_.dv.isDefined))
    assert(TxLog.optimize(spark, t, Some(xySchema)).contains(3L))
    assert(state(t) == before, "folding must not change contents")
    assert(TxLog.liveAdds(spark, t).forall(_.dv.isEmpty),
      "the packed dir carries no vectors")
    // the orphaned vector dir reclaims once out of the retention
    // window — retention 0 puts the horizon AT the head (v3, folded,
    // no vector references); at retention 1 the v2 snapshot would be
    // RETAINED and its vector must survive for in-window time travel
    // (r15, advised — pinned in Round15OpsSpec)
    val deleted = TxLog.vacuumDerived(spark, t, retainChangeVersions = 0)
    assert(deleted.contains("_dv/v0000000002"),
      s"the superseded vector must be reclaimed (got $deleted)")
    assert(state(t) == before, "reclaim must not touch the head read")
  }

  test("mixed-mode interleaving: DV merge → copy-on-write merge → DV " +
      "merge, every version readable, final state exact") {
    val t = seeded(1200L, 3)
    // v2: DV-mode delete
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((100L, 0L)).toDF("x", "y"), Seq("x"),
      deleteWhen = Some(lit(true)), updateSet = Map.empty,
      dvThreshold = 0.5) == 2L)
    // v3: copy-on-write heavy update (threshold 0 forces rewrite) —
    // the rewrite must FOLD v2's vector for its buckets
    assert(TxLogMerge.merge(spark, t, xySchema,
      (0L until 1200L by 2L).map(x => (x, x)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y"))) == 3L)
    // v4: DV-mode insert + update
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((2000L, 1L), (3L, 99L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      insertWhen = Some(lit(true)), dvThreshold = 0.5) == 4L)
    val expect = ((0L until 1200L).filter(_ != 100L).map { x =>
      val afterCow = if (x % 2 == 0) x else x * 10
      (x, if (x == 3L) 99L else afterCow)
    } :+ (2000L -> 1L)).sorted
    assert(state(t) == expect)
    // every version stays readable (time travel across modes)
    (0L to 4L).foreach(v => TxLog.read(spark, t, xySchema, Some(v)).count())
  }
}
