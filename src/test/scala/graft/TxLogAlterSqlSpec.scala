package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL ALTER TABLE over TxLog (r15) — rename/drop/add compile onto the
  * column-mapping verbs; everything else is loud. */
class TxLogAlterSqlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCat(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("txlogalter")
      .toString
    val cat = s"graftaltspec_${math.abs(root.hashCode).toString}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("rename keeps old files readable under the new name; drop then " +
      "re-add mints a fresh identity (old bytes stay invisible); " +
      "INSERT aligns by position across the evolution") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.t (x BIGINT, tag STRING) USING txlog")
    Seq((1L, "a"), (2L, "b")).toDF("x", "tag")
      .createOrReplaceTempView("alter_v1")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM alter_v1")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN tag TO label")
    val renamed = spark.sql(s"SELECT x, label FROM $cat.t ORDER BY x")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(renamed == Seq(1L -> "a", 2L -> "b"),
      "pre-rename files must read under the new name")
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN label")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN label STRING")
    val reborn = spark.sql(s"SELECT x, label FROM $cat.t ORDER BY x")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(reborn == Seq(1L -> None, 2L -> None),
      "dropped bytes must never leak into the reborn column")
    // positional insert with foreign column names lands correctly
    Seq((3L, "c")).toDF("p1", "p2").createOrReplaceTempView("alter_v2")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM alter_v2")
    val after = spark.sql(s"SELECT x, label FROM $cat.t WHERE x = 3")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq(3L -> "c"))
  }

  test("unsupported ALTER shapes are loud: type change, nested field, " +
      "non-nullable add, positioned add") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.u (x BIGINT, y STRING) USING txlog")
    val tc = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.u ALTER COLUMN x TYPE STRING")
    }
    assert(tc.getMessage.contains("not offered") ||
      tc.getMessage.contains("not supported"), s"got $tc")
    val pos = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.u ADD COLUMN z BIGINT FIRST")
    }
    assert(pos.getMessage.contains("positioned") ||
      pos.getMessage.contains("not offered"), s"got $pos")
    val nn = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.u ADD COLUMN z BIGINT NOT NULL")
    }
    assert(nn.getMessage.contains("nullable") ||
      nn.getMessage.contains("NOT NULL"), s"got $nn")
  }
}
