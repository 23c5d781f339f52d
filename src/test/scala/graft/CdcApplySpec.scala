package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Apply, ChangeFeed, Publication}

class CdcApplySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Hand-built feed: key 1 insert→update, key 2 insert→delete, key 3 insert. */
  private def feed: DataFrame =
    Seq(
      (1L, "users", "INSERT", 1L, 100L, 10.0, "{}"),
      (2L, "users", "UPDATE", 1L, 200L, 11.0, "{}"),
      (3L, "users", "INSERT", 2L, 300L, 20.0, "{}"),
      (4L, "users", "DELETE", 2L, 400L, 0.0, "{}"),
      (5L, "users", "INSERT", 3L, 500L, 30.0, "{}"))
      .toDF("lsn", "table_name", "op", "pk", "ts_us", "value", "props")

  test("latestSnapshot: highest LSN wins, tombstoned keys dropped") {
    val got = Apply.latestSnapshot(feed).orderBy("pk")
      .select("pk", "lsn", "value").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 11.0), (3L, 5L, 30.0)))
  }

  test("upsert: update, insert, delete, unchanged branches all hit") {
    val base = Seq((1L, 100.0), (2L, 200.0), (9L, 900.0)).toDF("k", "v")
    val got = Apply.upsert(base, feed, "users", "k", "v").orderBy("pk")
      .as[(Long, Double, String)].collect().toSeq
    // 1: updated, 2: deleted (gone), 3: inserted, 9: untouched base row
    assert(got == Seq((1L, 11.0, "UPDATE"), (3L, 30.0, "INSERT"), (9L, 900.0, "UNCHANGED")))
  }

  test("scd2: intervals close at next change; last row open + current") {
    val rows = Apply.scd2(feed).filter($"pk" === 1L).orderBy("lsn")
      .select("valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(rows == Seq((100L, Some(200L), false), (200L, None, true)))
  }

  test("beforeAfter pairs UPDATE with previous per-key value") {
    val rows = Apply.beforeAfter(feed)
      .select("pk", "before_value", "after_value").as[(Long, Double, Double)].collect().toSeq
    assert(rows == Seq((1L, 10.0, 11.0)))
  }

  test("resumeFrom is strictly-after, like StartReplication(lsn+1)") {
    assert(Apply.resumeFrom(feed, 3L).agg(min("lsn")).as[Long].head() == 4L)
  }

  test("publication event mask + condition + selector") {
    val pub = Publication("users",
      selector = Seq("value"),
      condition = Some(col("value") >= 20.0),
      eventMask = Set("INSERT"))
    val got = pub(feed).orderBy("lsn").select("pk", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 20.0), (3L, 30.0)))
    assert(pub(feed).columns.toSeq == Seq("lsn", "table_name", "op", "pk", "value"))
  }

  test("publication condition pushes into the parquet scan") {
    val events = sources.Tables(spark, sf, "events")
    val plan = Publication("users", condition = Some(col("value") > 150.0))(
      ChangeFeed.fromEvents(events)).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("GreaterThan(value,150.0)"), plan.take(2000))
  }

  test("withImages: nil rules match the reference handler per op") {
    val rows = graft.cdc.ChangeFeed.withImages(feed)
      .orderBy("lsn")
      .select("op", "before", "after")
      .collect()
    rows.foreach { r =>
      val (op, before, after) = (r.getString(0), r.get(1), r.get(2))
      op match {
        case "INSERT" => assert(before == null && after != null)
        case "DELETE" => assert(after == null)
        case "UPDATE" => assert(after != null) // before nullable (first-seen key)
      }
    }
    // UPDATE after an INSERT carries the previous image
    val upd = graft.cdc.ChangeFeed.withImages(feed)
      .filter($"lsn" === 2L).select("before").collect().head.getMap[String, String](0)
    assert(upd("value") == "10.0")
  }

  test("bitemporal: both axes bound the read; corrections win at equal valid time") {
    // pk 1: valid-time 100 state written at lsn 1, CORRECTED at lsn 4
    // (same valid instant — higher lsn must win); a future-valid row at
    // ts 900 (lsn 3) is invisible at T=500; pk 2: deleted as of T;
    // pk 3: written only at lsn 9 — invisible at L=5 (not yet known)
    val f = Seq(
      (1L, "users", "INSERT", 1L, 100L, 10.0, "{}"),
      (3L, "users", "UPDATE", 1L, 900L, 13.0, "{}"),
      (4L, "users", "UPDATE", 1L, 100L, 11.5, "{}"),
      (2L, "users", "INSERT", 2L, 200L, 20.0, "{}"),
      (5L, "users", "DELETE", 2L, 300L, 0.0, "{}"),
      (9L, "users", "INSERT", 3L, 100L, 30.0, "{}"))
      .toDF("lsn", "table_name", "op", "pk", "ts_us", "value", "props")
    val got = Apply.bitemporal(f, 5L, lit(500L))
      .select("pk", "lsn", "value").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 11.5)), s"got $got")
  }

  test("merkle diff: changed buckets flagged with exact descent counts, clean buckets match") {
    // pk 1 (bucket 1): modified between L=300 and L=700; pk 2 (bucket 2):
    // removed; pk 66 (bucket 2): unchanged — shares the bucket with a
    // change, so its bucket still mismatches but contributes no changed
    // key; pk 3 (bucket 3): unchanged and alone — bucket must match
    val f = Seq(
      (100L, "users", "INSERT", 1L, 100L, 10.0, "{}"),
      (400L, "users", "UPDATE", 1L, 200L, 11.0, "{}"),
      (110L, "users", "INSERT", 2L, 300L, 20.0, "{}"),
      (410L, "users", "DELETE", 2L, 400L, 0.0, "{}"),
      (120L, "users", "INSERT", 66L, 500L, 66.0, "{}"),
      (130L, "users", "INSERT", 3L, 600L, 30.0, "{}"))
      .toDF("lsn", "table_name", "op", "pk", "ts_us", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("merkle-lake").toString
    try {
      // route through the gate query: write an events lake whose canonical
      // feed IS f (even user_id → users; op mapping per ChangeFeed)
      val ev = f.select(col("lsn").as("event_id"),
        expr("timestamp_micros(ts_us)").as("ts"),
        (col("pk") * 2).as("user_id"),
        when(col("op") === "INSERT", "signup")
          .when(col("op") === "DELETE", "error")
          .otherwise("page").as("event_type"),
        col("value"), col("props"))
      ev.write.parquet(s"$dir/events.parquet")
      val got = graft.queries.CdcQueries.queries("cdc_merkle_diff")(spark, dir)
        .collect().map(r => r.getLong(1) ->
          (r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(7))).toMap
      // buckets keyed by pk*2 mod 64: pk1→2, pk2→4, pk66→4 (132 % 64),
      // pk3→6
      assert(got(2L)._3 == 0L && got(2L)._4 == 1L, s"modified bucket: $got")
      assert(got(4L) == (2L, 1L, 0L, 1L),
        s"removed key's bucket keeps the unchanged cohabitant: $got")
      assert(got(6L)._3 == 1L && got(6L)._4 == 0L, s"clean bucket: $got")
    } finally graft.operators.Checkpointing.deleteRecursively(dir)
  }

  test("driver-table feed maps the reference event enum deterministically") {
    val ops = ChangeFeed.fromEvents(sources.Tables(spark, sf, "events"))
      .select("op").distinct().as[String].collect().toSet
    assert(ops == Set("INSERT", "UPDATE", "DELETE"))
  }
}
