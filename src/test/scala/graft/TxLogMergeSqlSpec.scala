package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** SQL MERGE INTO over TxLog tables (r14): the post-hoc resolution rule
  * rewrites a resolved MergeIntoTable onto the gated Scala merge verb —
  * delete/update/insert clauses, listed-order semantics, the deletion-
  * vector conf knob, and loud refusals for the unsupported shapes. */
class TxLogMergeSqlSpec extends AnyFunSuite with SparkTestBase {
  import graft.sources.TxLog

  private val xySchema = StructType.fromDDL("x BIGINT, y BIGINT")

  /** A fresh session carrying GraftExtensions (the GraftExtensionsSpec
    * pattern — static conf, so it rides a builder, and the shared
    * default session is reinstated afterwards). */
  private def withExtSession[T](f: SparkSession => T): T = {
    spark.sparkContext // force the shared context up first
    val loaded = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val orig = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().withExtensions(loaded).getOrCreate()
    try f(s)
    finally orig.foreach { o =>
      SparkSession.setDefaultSession(o)
      SparkSession.setActiveSession(o)
    }
  }

  test("MERGE INTO: delete + update + conditional insert through pure " +
      "SQL equals the Scala verb's semantics; listed-order UPDATE-then-" +
      "DELETE compiles into the delete condition") {
    withExtSession { s =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("mergesql").toString
      s.conf.set("spark.sql.catalog.msql", "graft.sources.TxLogCatalog")
      s.conf.set("spark.sql.catalog.msql.root", root)
      s.sql("CREATE TABLE msql.t (x BIGINT, y BIGINT) USING txlog")
      s.sql("INSERT INTO msql.t VALUES (0, 0), (1, 10), (2, 20), (3, 30)")
      Seq((1L, 0L), (2L, 100L), (9L, 90L), (3L, 5L))
        .toDF("x", "y").createOrReplaceTempView("src")
      s.sql(
        """MERGE INTO msql.t AS t USING src AS s ON t.x = s.x
          |WHEN MATCHED AND t.x = 1 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET y = t.y + s.y
          |WHEN NOT MATCHED AND s.y > 0 THEN INSERT (x, y) VALUES (s.x, s.y)
          |""".stripMargin)
      assert(s.sql("SELECT x, y FROM msql.t ORDER BY x").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((0L, 0L), (2L, 120L), (3L, 35L), (9L, 90L)))
      // UPDATE listed before DELETE: the update shields matched rows
      // its condition accepts — SQL's listed-order rule
      Seq((2L, 1L), (3L, 1L)).toDF("x", "y").createOrReplaceTempView("s2")
      s.sql(
        """MERGE INTO msql.t AS t USING s2 AS s ON t.x = s.x
          |WHEN MATCHED AND t.x = 2 THEN UPDATE SET y = 222
          |WHEN MATCHED THEN DELETE
          |""".stripMargin)
      assert(s.sql("SELECT x, y FROM msql.t ORDER BY x").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((0L, 0L), (2L, 222L), (9L, 90L)),
        "x=2 updated (listed first), x=3 deleted (fell through)")
      // the DV knob rides the session conf: a sparse SQL merge writes a
      // vector instead of rewriting its bucket
      s.conf.set("graft.txlog.merge.dvThreshold", "0.9")
      try {
        Seq((9L, 9L)).toDF("x", "y").createOrReplaceTempView("s3")
        s.sql(
          """MERGE INTO msql.t AS t USING s3 AS s ON t.x = s.x
            |WHEN MATCHED THEN UPDATE SET y = s.y
            |""".stripMargin)
        assert(TxLog.liveAdds(s, s"$root/t").exists(_.dv.isDefined),
          "the sparse SQL merge must take the deletion-vector path")
        assert(s.sql("SELECT y FROM msql.t WHERE x = 9").head().getLong(0)
          == 9L)
      } finally s.conf.unset("graft.txlog.merge.dvThreshold")
    }
  }

  test("unsupported MERGE shapes are loud with the Scala-verb remedy, " +
      "never silently approximated") {
    withExtSession { s =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("mergesql2").toString
      s.conf.set("spark.sql.catalog.msql2", "graft.sources.TxLogCatalog")
      s.conf.set("spark.sql.catalog.msql2.root", root)
      s.sql("CREATE TABLE msql2.t (x BIGINT, y BIGINT) USING txlog")
      s.sql("INSERT INTO msql2.t VALUES (1, 10)")
      Seq((1L, 1L)).toDF("x", "y").createOrReplaceTempView("u")
      def loud(sql: String, frag: String): Unit = {
        val e = intercept[Exception](s.sql(sql))
        def all(t: Throwable): Seq[String] =
          if (t == null) Nil else t.getMessage +: all(t.getCause)
        assert(all(e).exists(m => m != null && m.contains(frag)),
          s"expected '$frag' in ${all(e)}")
      }
      loud("""MERGE INTO msql2.t AS t USING u AS s ON t.x < s.x
             |WHEN MATCHED THEN DELETE""".stripMargin, "non-equi")
      loud("""MERGE INTO msql2.t AS t USING u AS s ON t.x = s.x
             |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
        "NOT MATCHED BY SOURCE")
      loud("""MERGE INTO msql2.t AS t USING u AS s ON t.x = s.x
             |WHEN NOT MATCHED THEN INSERT (x, y) VALUES (s.x, s.y + 1)
             |""".stripMargin, "non-identity INSERT")
    }
  }
}
