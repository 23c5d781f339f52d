package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.col

/** SQL UPDATE / DELETE over TxLog tables (r15 — VERDICT item 1): both
  * statements compile onto TxLogMerge.merge through the resolution-rule
  * interception, recover row-identity keys from the bucket layout's
  * `__keys` record (or the `graft.txlog.dml.keys` conf for a fresh
  * table), honor the DV-threshold and change-feed knobs, and are LOUD
  * on unsupported shapes. */
class TxLogDmlSqlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.sources.{TxLog, TxLogMerge}

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  /** A cataloged TxLog table of (x, y = 10x), x in [0, n) — returns
    * (sql identifier, table dir). */
  private def seeded(n: Long): (String, String) = {
    val td = java.nio.file.Files.createTempDirectory("txlogdml").toString
    val t = s"$td/t"
    (0L until n).map(x => (x, x * 10)).toDF("x", "y").write.parquet(s"$t/init")
    assert(TxLog.tryCommitActions(spark, t, 0L, Seq(TxLog.AddFile("init")),
      Nil, schemaDdl = Some(xySchema.toDDL), cdf = Some("@adds")))
    val cat = s"graftdml_${math.abs(td.hashCode).toString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", td)
    (s"$cat.t", t)
  }

  private def state(t: String): Map[Long, Long] =
    TxLog.read(spark, t, xySchema).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("DELETE FROM … WHERE on a fresh table: keys from the conf, the " +
      "statement bucketizes and deletes exactly the matching rows; a " +
      "second DELETE recovers keys from the layout record alone") {
    val (id, t) = seeded(100L)
    spark.conf.set("graft.txlog.dml.keys", "x")
    try spark.sql(s"DELETE FROM $id WHERE x % 10 = 3")
    finally spark.conf.unset("graft.txlog.dml.keys")
    val s1 = state(t)
    assert(s1.size == 90 && !s1.contains(3L) && !s1.contains(93L))
    assert(TxLog.liveAdds(spark, t).forall(_.part.get("__keys")
      .contains("x")), "the bucketizing merge must record the keys")
    // no conf now — keys recovered from the log
    spark.sql(s"DELETE FROM $id WHERE y >= 900")
    val s2 = state(t)
    assert(s2.size == 81 && !s2.contains(90L) && s2.contains(89L))
  }

  test("UPDATE … SET … WHERE compiles onto the merge verb: assigned " +
      "rows change, others carry; an unconditioned UPDATE touches " +
      "every row") {
    val (id, t) = seeded(100L)
    spark.conf.set("graft.txlog.dml.keys", "x")
    try spark.sql(s"UPDATE $id SET y = y * 2 + 1 WHERE x < 5")
    finally spark.conf.unset("graft.txlog.dml.keys")
    val s1 = state(t)
    assert(s1(0L) == 1L && s1(4L) == 81L && s1(5L) == 50L && s1.size == 100)
    spark.sql(s"UPDATE $id SET y = 0")
    val s2 = state(t)
    assert(s2.size == 100 && s2.values.forall(_ == 0L))
  }

  test("the DV-threshold knob rides SQL DML: a sparse DELETE takes the " +
      "merge-on-read path (vectors live at head), and the change-feed " +
      "knob records a feed the follower can read") {
    val (id, t) = seeded(2000L)
    spark.conf.set("graft.txlog.dml.keys", "x")
    try spark.sql(s"UPDATE $id SET y = y WHERE x = 0") // bucketize first
    finally spark.conf.unset("graft.txlog.dml.keys")
    spark.conf.set("graft.txlog.merge.dvThreshold", "0.5")
    spark.conf.set("graft.txlog.merge.changeFeed", "true")
    try spark.sql(s"DELETE FROM $id WHERE x = 77 OR x = 991")
    finally {
      spark.conf.unset("graft.txlog.merge.dvThreshold")
      spark.conf.unset("graft.txlog.merge.changeFeed")
    }
    assert(TxLog.liveAdds(spark, t).exists(_.dv.isDefined),
      "the sparse SQL DELETE must take the deletion-vector path")
    val st = state(t)
    assert(st.size == 1998 && !st.contains(77L) && !st.contains(991L))
    val feed = TxLogMerge.readChangeFeed(spark, t, xySchema,
      TxLog.currentVersion(spark, t).get)
    val dels = feed.filter(col("_change_type") === "delete")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == Seq(77L, 991L), "the feed must carry exactly the deletes")
  }

  test("SQL ≡ Scala: the same delete+update pair through SQL hashes " +
      "identically to the Scala merge twin") {
    val (id, tSql) = seeded(500L)
    val (_, tScala) = seeded(500L)
    spark.conf.set("graft.txlog.dml.keys", "x")
    try {
      spark.sql(s"DELETE FROM $id WHERE x % 7 = 0")
      spark.sql(s"UPDATE $id SET y = y + 5 WHERE x % 3 = 0")
    } finally spark.conf.unset("graft.txlog.dml.keys")
    val base = TxLog.read(spark, tScala, xySchema)
    assert(TxLogMerge.merge(spark, tScala, xySchema,
      base.filter(col("x") % 7 === 0), Seq("x"),
      deleteWhen = Some(col("x") % 7 === 0)) == 1L)
    assert(TxLogMerge.merge(spark, tScala, xySchema,
      TxLog.read(spark, tScala, xySchema).filter(col("x") % 3 === 0),
      Seq("x"),
      updateSet = Map("y" -> (col("y") + 5L)),
      updateWhen = Some(col("x") % 3 === 0)) == 2L)
    assert(state(tSql) == state(tScala))
  }

  test("loud unsupported shapes: SET of a key column, a subquery " +
      "condition, and a keyless fresh table") {
    val (id, _) = seeded(50L)
    val (id2, _) = seeded(50L)
    intercept[IllegalArgumentException] { // no conf, no layout record
      spark.sql(s"DELETE FROM $id2 WHERE x = 1")
    }
    spark.conf.set("graft.txlog.dml.keys", "x")
    try {
      intercept[IllegalArgumentException] { // merge guard: key assignment
        spark.sql(s"UPDATE $id SET x = x + 1")
      }
      // a subquery condition is refused LOUDLY — by Spark's own
      // analyzer for this plan shape (ExtendedAnalysisException), with
      // the command's own UnsupportedOperationException as the backstop
      // for shapes the analyzer lets through
      val thrown = intercept[Exception] {
        spark.sql(
          s"DELETE FROM $id WHERE x IN (SELECT x FROM $id WHERE y > 400)")
      }
      assert(thrown.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        thrown.isInstanceOf[UnsupportedOperationException],
        s"unexpected refusal class: $thrown")
    } finally spark.conf.unset("graft.txlog.dml.keys")
  }

  test("a merge keyed differently from the recorded layout is refused " +
      "(the wrong-bucket-pruning hole closed by the __keys record)") {
    val (_, t) = seeded(100L)
    assert(TxLogMerge.merge(spark, t, xySchema,
      Seq((0L, 0L)).toDF("x", "y"), Seq("x"),
      updateSet = Map("y" -> col(s"${TxLogMerge.Src}y")), nBuckets = 4) == 1L)
    val e = intercept[IllegalArgumentException] {
      TxLogMerge.merge(spark, t, xySchema,
        Seq((0L, 0L)).toDF("x", "y"), Seq("y"),
        deleteWhen = Some(col("y") <=> 0L))
    }
    assert(e.getMessage.contains("keyed on"))
  }
}
