package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven deployment route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose every native
  * function to pure SQL — no library imports, no register() calls. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("GraftExtensions-built sessions expose the functions to pure SQL") {
    spark.sparkContext // force the shared context up first
    // spark.sql.extensions is a STATIC conf: Spark reads it from the
    // SparkContext's conf at session build and instantiates the class by
    // name — mirror that loading step here, then drive the same injection
    // through builder.withExtensions on the shared context (a post-hoc
    // session builder cannot set a static conf).
    val loaded = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val orig = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(loaded)
      .getOrCreate()
    try {
      assert(s ne orig.orNull, "expected a fresh session with extensions applied")
      val row = s.sql(
        """SELECT ngram_minhash_md5('hello world foo bar', 3, 64) AS sig,
          |       md5_fingerprint(array('a', 'b')) AS fp,
          |       cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
          |       nearest_centroid(array(1.0F, 0.0F),
          |         array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS nc,
          |       project_planes(array(1.0F, 0.0F), 2) AS pj,
          |       pq_encode(array(1.0F, 0.0F),
          |         array(array(1.0D, 0.0D), array(0.0D, 1.0D)), 1) AS pqc
          |""".stripMargin).head()
      // slot 0 matches the Md5MinHashFromText golden (NativeHashSpec)
      assert(row.getSeq[Long](0).head == 1752949636433043825L)
      assert(row.getLong(1) > 0L)
      assert(row.getDouble(2) == 1.0)
      assert(row.getInt(3) == 0)
      assert(row.getSeq[Double](4).length == 2)
      // (1,0) is exactly sub-centroid 0, not (0,1)
      assert(row.getSeq[Int](5) == Seq(0))
      // aggregates route through the same injection
      val agg = s.sql(
        """SELECT topk(struct(CAST(id AS DOUBLE), CAST(id AS BIGINT)), 2) AS top
          |FROM (SELECT explode(sequence(1, 5)) AS id)""".stripMargin).head()
      assert(agg.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)) == Seq(5L, 4L))
      val hh = s.sql(
        """SELECT freq_items(t, 4) AS hh
          |FROM (SELECT explode(array('a', 'a', 'b', 'c', 'a')) AS t)""".stripMargin).head()
      val top = hh.getSeq[org.apache.spark.sql.Row](0).head
      assert(top.getString(0) == "a" && top.getLong(1) == 3L)
      val bb = s.sql(
        """WITH k AS (SELECT CAST(id AS BIGINT) AS id
          |           FROM (SELECT explode(sequence(1, 5)) AS id)),
          |b AS (SELECT bloom_agg(id, 64, 3) AS bloom,
          |             bitmap_distinct(id, 64) AS nd FROM k)
          |SELECT nd, bloom_contains(bloom, 3L) AS hit FROM b""".stripMargin)
        .head()
      assert(bb.getLong(0) == 5L && bb.getBoolean(1))
    } finally {
      // do NOT s.stop(): that stops the SHARED SparkContext and every
      // later suite with it. Just reinstate the original default session;
      // the extra session is inert once nothing references it.
      orig.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }
}
