package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** OCC conflict detection for concurrent merges (r15 — VERDICT item 3):
  * each merge's write set is its touched-bucket set; a lost commit CAS
  * re-validates against the interleaved commits' write sets and
  * re-commits at head+1 WITHOUT re-execution when provably disjoint —
  * true overlap (or any non-bucket-granular interleaved commit) stays
  * loud. Also pins the r15 staging-race fix: version-named merge dirs
  * are single-claim, so a racing merge can never destroy a committed
  * winner's bytes (the old in-place overwrite could). */
class TxLogOccSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlogocc").toString + "/t"

  /** A bucketized (nb buckets) table of (x, y = 10x), x in [0, n). */
  private def seeded(n: Long, nb: Int): String = {
    val t = freshTable()
    (0L until n).map(x => (x, x * 10)).toDF("x", "y")
      .write.parquet(s"$t/init")
    assert(TxLog.tryCommit(spark, t, 0L, Seq("init"), Nil))
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((0L, 0L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")),
      nBuckets = nb) == 1L)
    t
  }

  /** Keys 0..n-1 split by their merge bucket (the same xxhash64 law the
    * verb uses). */
  private def keysByBucket(n: Long, nb: Int): Map[Long, Seq[Long]] =
    (0L until n).toDF("x")
      .select(col("x"), pmod(xxhash64(col("x")), lit(nb.toLong)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap

  private def state(t: String): Map[Long, Long] =
    TxLog.read(spark, t, xySchema).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private def mergeDelete(t: String, keys: Seq[Long]): Long =
    TxLogMerge.merge(spark, t, xySchema,
      keys.map(x => (x, 0L)).toDF("x", "y"), Seq("x"),
      deleteWhen = Some(lit(true)))

  test("disjoint-bucket two-writer race: the CAS loser re-validates " +
      "and COMMITS at head+1 without re-execution; the table equals " +
      "the serial result") {
    val t = seeded(2000L, 2)
    val byB = keysByBucket(2000L, 2)
    val aKeys = byB(0L).take(3) // writer A: bucket 0 only
    val bKeys = byB(1L).take(3) // writer B: bucket 1 only
    // B claims its dirs, then the hook interleaves A's FULL merge
    // (commits v2), then B's first CAS at v2 fails → OCC must see A's
    // write set {bucket 0} disjoint from B's {bucket 1} and commit v3
    TxLogMerge.beforeFirstCommit = Some(() => {
      assert(mergeDelete(t, aKeys) == 2L, "the interleaved merge commits")
    })
    try assert(mergeDelete(t, bKeys) == 3L,
      "the loser must re-commit at head+1 without re-execution")
    finally TxLogMerge.beforeFirstCommit = None
    val st = state(t)
    assert(st.size == 2000 - 6)
    (aKeys ++ bKeys).foreach(k => assert(!st.contains(k), s"key $k"))
    // every version still reads (no destroyed dirs — the staging fix)
    assert(TxLog.read(spark, t, xySchema, Some(2L)).count() == 1997L)
    assert(TxLog.read(spark, t, xySchema, Some(1L)).count() == 2000L)
  }

  test("overlapping-bucket race: the loser re-runs LOUDLY, nothing " +
      "committed, claimed dirs cleaned up, winner's result intact") {
    val t = seeded(2000L, 2)
    val byB = keysByBucket(2000L, 2)
    val aKeys = byB(0L).take(3)
    val bKeys = byB(0L).slice(10, 13) // same bucket: true overlap
    TxLogMerge.beforeFirstCommit = Some(() => {
      assert(mergeDelete(t, aKeys) == 2L)
    })
    val e = try intercept[IllegalArgumentException] {
      mergeDelete(t, bKeys)
    } finally TxLogMerge.beforeFirstCommit = None
    assert(e.getMessage.contains("OVERLAPS"))
    assert(TxLog.currentVersion(spark, t).contains(2L),
      "the loser must not have committed")
    val st = state(t)
    assert(st.size == 1997 && bKeys.forall(st.contains),
      "only the winner's deletes apply")
    // the loser's claimed dirs are cleaned up — no mrg/dv orphans
    // beyond the committed history
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath.getName).filter(_.startsWith("mrg")).toSet
    val live = TxLog.liveAdds(spark, t).map(_.name.split("/")(0)).toSet
    assert(dirs.forall(live.contains),
      s"orphan merge dirs left behind: ${dirs -- live}")
  }

  test("a non-bucket-granular interleaved commit (append) is a " +
      "conflict even when buckets look free — loud, never a silent " +
      "wrong merge") {
    val t = seeded(500L, 2)
    TxLogMerge.beforeFirstCommit = Some(() => {
      assert(TxLog.append(
        Seq((9999L, 1L)).toDF("x", "y"), t, "late") == 2L)
    })
    val e = try intercept[IllegalArgumentException] {
      mergeDelete(t, Seq(1L))
    } finally TxLogMerge.beforeFirstCommit = None
    assert(e.getMessage.contains("OVERLAPS"))
    assert(state(t).contains(1L), "nothing of the loser applied")
  }

  test("three-way: two disjoint losers in sequence both ride OCC — " +
      "versions stack without re-execution") {
    val t = seeded(3000L, 4)
    val byB = keysByBucket(3000L, 4)
    // writer C (outermost) keys bucket 2; hook chain: B (bucket 1)
    // whose own hook runs A (bucket 0) — A commits v2, B OCC-commits
    // v3, C fails CAS at v2 then v3… sees both disjoint, commits v4
    TxLogMerge.beforeFirstCommit = Some(() => {
      TxLogMerge.beforeFirstCommit = Some(() => {
        assert(mergeDelete(t, byB(0L).take(2)) == 2L)
      })
      assert(mergeDelete(t, byB(1L).take(2)) == 3L)
    })
    try assert(mergeDelete(t, byB(2L).take(2)) == 4L)
    finally TxLogMerge.beforeFirstCommit = None
    assert(state(t).size == 3000 - 6)
  }
}
