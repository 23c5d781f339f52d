package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cdc.Apply

/** Unit/property specs for the round-6 operators — crafted-input behavior
  * the corpus-level oracle gate can't isolate: classification edges of the
  * snapshot diff, the time-travel ↔ latest-snapshot identity, rule-boundary
  * bits of the Gopher gate, tercile-structure invariants of the CCNet
  * buckets, and the probability/extremum laws of the transition matrix and
  * key-skew reports.
  */
class Round6OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def feedOf(rows: (Long, String, String, Long, Double, String)*) =
    rows.toDF("lsn", "table_name", "op", "pk", "value", "props")
      .withColumn("ts_us", col("lsn") * 1000)

  test("snapshotDiff: ADDED/REMOVED/MODIFIED incl. props-only and tombstones") {
    val feed = feedOf(
      // pk 1: exists at A, value changes by B → MODIFIED
      (100L, "users", "INSERT", 1L, 10.0, "p"),
      (500L, "users", "UPDATE", 1L, 20.0, "p"),
      // pk 2: born after A → ADDED
      (400L, "users", "INSERT", 2L, 5.0, "p"),
      // pk 3: deleted between A and B → REMOVED
      (150L, "users", "INSERT", 3L, 7.0, "p"),
      (600L, "users", "DELETE", 3L, 7.0, "p"),
      // pk 4: identical state both sides → absent from the diff
      (120L, "users", "INSERT", 4L, 1.0, "p"),
      // pk 5: props-only change → MODIFIED (the full-row compare)
      (130L, "users", "INSERT", 5L, 3.0, "old"),
      (550L, "users", "UPDATE", 5L, 3.0, "new"),
      // pk 6: deleted before A, still deleted at B → absent
      (110L, "users", "INSERT", 6L, 9.0, "p"),
      (140L, "users", "DELETE", 6L, 9.0, "p"))
    val got = Apply.snapshotDiff(feed, 300L, 700L)
      .select("pk", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "MODIFIED", 2L -> "ADDED", 3L -> "REMOVED",
      5L -> "MODIFIED"))
  }

  test("asOf at the feed's max LSN equals latestSnapshot; prefix is a prefix") {
    val feed = cdc.ChangeFeed.fromEvents(sources.Tables(spark, sf, "events"))
    val maxLsn = feed.agg(max("lsn")).as[Long].head()
    val full = Apply.latestSnapshot(feed).collect().toSet
    assert(Apply.asOf(feed, maxLsn).collect().toSet == full)
    // a mid-feed cut never shows state from above the cut
    val cut = Apply.asOf(feed, maxLsn / 2)
    assert(cut.agg(max("lsn")).as[Long].head() <= maxLsn / 2)
  }

  test("time-weighted avg: constant value → that value; weighting is by duration") {
    // user 1: 10.0 over [0,9), then 90.0 over [9,10) — TWA = 18.0; the
    // closing event's value is never weighted (no interval after it).
    // Drives the PRODUCTION operator, not a replica.
    val ev = Seq((1L, 1L, 0L, 10.0), (1L, 2L, 9L, 90.0), (1L, 3L, 10L, 0.0),
      (2L, 4L, 0L, 42.0), (2L, 5L, 100L, 42.0),
      (3L, 6L, 50L, 7.0)) // single event: no interval → absent
      .toDF("user_id", "event_id", "ts_us", "value")
    val twa = operators.Relational
      .timeWeightedAvg(ev, "user_id", "ts_us", "event_id", "value")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(twa(2L)._3 == 42.0, "constant value must time-average to itself")
    assert(twa(1L)._3 == (10.0 * 9 + 90.0 * 1) / 10, s"duration weighting: ${twa(1L)}")
    assert(!twa.contains(3L), "a single-event key has no time extent")
    // and the registered query runs against the lake with sane output
    val rows = queries.RelationalQueries.queries("q_time_weighted_avg")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 1))
  }

  test("q_key_skew: rank 1 is the true heaviest key; ratios are vs average") {
    val got = queries.RelationalQueries.queries("q_key_skew")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 5 && got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val evc = sources.Tables(spark, sf, "events")
      .groupBy("user_id").count().agg(max("count")).as[Long].head()
    assert(got.head._3 == evc, "rank 1 must carry the true max fan-in")
    // counts are non-increasing down the ranks; ratio ≥ 1 at rank 1
    assert(got.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    assert(got.head._6 >= 1.0)
  }

  test("transition matrix: per-from probabilities sum to 1 (4dp)") {
    val got = queries.BehaviorQueries.queries("q_transition_matrix")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (from, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 0.001 * rows.size,
        s"$from: probabilities sum to $s")
    }
  }

  test("gopher gate: each rule flips at its exact boundary") {
    def gate(texts: Seq[String]) = {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // drives the PRODUCTION rule columns (Text.gopher) — the same
      // expressions text_gopher_filters selects, thresholds included
      val g = functions.Text.gopher(col("text"))
      df.select(col("doc_id"),
          (g.okWordCount === 1L).as("okW"), (g.okMeanLen === 1L).as("okM"),
          (g.okAlpha === 1L).as("okA"), (g.okStop === 1L).as("okS"))
        .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
        .sortBy(_._1)
    }
    val w49 = Seq.fill(49)("abcd").mkString(" ")   // 49 words: fails count
    val w50 = Seq.fill(50)("abcd").mkString(" ")   // 50 words: passes
    val short = Seq.fill(50)("ab").mkString(" ")   // mean len 2 < 3: fails
    val stops = "the of " + Seq.fill(48)("abcd").mkString(" ") // 2 stops: passes
    val oneStop = "the " + Seq.fill(49)("zzzz").mkString(" ")  // 1 stop: fails
    val digits = Seq.fill(50)("1234").mkString(" ")            // 0% alpha: fails
    val got = gate(Seq(w49, w50, short, stops, oneStop, digits))
    assert(!got(0)._2 && got(1)._2, "word-count boundary at 50")
    assert(got(1)._3 && !got(2)._3, "mean-length boundary at 3")
    assert(got(3)._5 && !got(4)._5, "stopword boundary at 2")
    assert(got(1)._4 && !got(5)._4, "alpha-fraction rule")
  }

  test("ccnet buckets: partition the scored docs; tercile order holds per lang") {
    val buckets = queries.TextQueries.queries("text_ccnet_buckets")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    val scoredDocs = queries.TextQueries.queries("text_lm_score")(spark, sf)
      .filter(col("lm_score").isNotNull).count()
    assert(buckets.map(_._3).sum == scoredDocs,
      "bucket counts must partition the scored docs")
    buckets.groupBy(_._1).foreach { case (lang, rows) =>
      val by = rows.map(r => r._2 -> r).toMap
      // score ORDER: every tail score ≤ every middle score ≤ every head
      // score (ties share a bucket, so boundaries may touch)
      for (lo <- by.get("tail"); mid <- by.get("middle"))
        assert(lo._5 <= mid._4, s"$lang: tail max above middle min")
      for (mid <- by.get("middle"); hi <- by.get("head"))
        assert(mid._5 <= hi._4, s"$lang: middle max above head min")
      for (lo <- by.get("tail"); hi <- by.get("head"))
        assert(lo._5 <= hi._4, s"$lang: tail above head")
    }
  }

  test("radius audit: recall in [0,1]; exact set at least as large as LSH's") {
    val got = queries.VectorQueries.queries("knn_range_audit")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nExact, nLsh, recall) =>
      assert(nLsh <= nExact, s"q$q: LSH radius set must be contained")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - nLsh.toDouble / nExact) < 1e-3)
    }
  }
}
