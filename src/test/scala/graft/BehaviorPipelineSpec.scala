package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property specs for the behavior-analytics (funnel/retention) and
  * corpus-curation (stratified sample / token budget / tf-idf) queries —
  * exactness is the DuckDB oracle's job; these pin the semantic invariants
  * that survive data changes.
  */
class BehaviorPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("Behavior.funnel on crafted journeys: strict order, first event wins") {
    val events = Seq(
      // u1: complete journey in order
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // u2: click BEFORE the first view never qualifies; the purchase
      // cannot count without a qualifying click
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 200L),
      // u3: earliest view wins (50); a click AT that instant is not
      // strictly after it
      (3L, "view", 100L), (3L, "view", 50L), (3L, "click", 50L),
      // u4: stalls after click
      (4L, "view", 10L), (4L, "click", 20L))
      .toDF("user_id", "event_type", "ts_us")
    val got = operators.Behavior
      .funnel(events, "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"))
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("1_view", 4L, None),
      ("2_click", 2L, Some(110L)),     // u1: 200-100, u4: 20-10
      ("3_purchase", 1L, Some(100L)))) // u1: 300-200
  }

  test("Behavior.funnel maxGapUs: out-of-window events never convert") {
    val events = Seq(
      // u1: click 50 after view → inside a 60-gap window
      (1L, "view", 100L), (1L, "click", 150L),
      // u2: first click lands outside the window; NO re-anchoring on the
      // later in-window... there is none — excluded
      (2L, "view", 100L), (2L, "click", 200L),
      // u3: an early out-of-window click is ignored, but a later event
      // CANNOT rescue it either (min is over in-window events only —
      // here the 150 click converts, the 300 is simply later)
      (3L, "view", 100L), (3L, "click", 150L), (3L, "click", 300L))
      .toDF("user_id", "event_type", "ts_us")
    val got = operators.Behavior
      .funnel(events, "user_id", "event_type", "ts_us",
        Seq("view", "click"), maxGapUs = Some(60L))
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("1_view", 3L, None),
      ("2_click", 2L, Some(100L)))) // u1: 50, u3: 50; u2 excluded
    // unbounded form unchanged: u2 converts there
    val unbounded = operators.Behavior
      .funnel(events, "user_id", "event_type", "ts_us", Seq("view", "click"))
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(unbounded == Seq(("1_view", 3L, None), ("2_click", 3L, Some(200L))))
  }

  test("Behavior.retention on crafted cohorts: offsets from first signup bucket") {
    val events = Seq(
      (1L, "signup", 0L), (1L, "view", 150L), (1L, "view", 250L),
      (2L, "signup", 120L), (2L, "view", 130L), (2L, "view", 350L),
      (3L, "view", 500L)) // never signed up → excluded
      .toDF("user_id", "event_type", "ts_us")
    val got = operators.Behavior
      .retention(events, "user_id", "event_type", "ts_us", "signup", 100L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L), // u1: wk0, wk1, wk2
      (1L, 0L, 1L), (1L, 2L, 1L)))              // u2: wk1 (dedup), wk3
  }

  test("q_funnel: stages shrink monotonically, deltas are positive sums") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf)
      .orderBy("stage")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(rows.map(_._1) == Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_._2)
    assert(counts == counts.sorted.reverse, s"funnel must shrink: $counts")
    assert(counts.head > 0)
    assert(rows.head._3.isEmpty) // first stage has no previous stage
    // strict ordering ⇒ every per-user delta > 0 ⇒ positive sums
    rows.tail.filter(_._2 > 0).foreach(r => assert(r._3.exists(_ > 0)))
  }

  test("q_retention: offset-0 activity equals cohort size (signup itself counts)") {
    val weekUs = 604800000000L
    val got = SparkEntry.queries("q_retention")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(_._2 >= 0))
    val evBase = sources.Tables(spark, sf, "events")
    val cohortSizes = evBase
      .withColumn("ts_us", sources.Tables.tsMicros(evBase))
      .filter($"event_type" === "signup")
      .groupBy("user_id").agg(expr(s"min(ts_us) div $weekUs").as("cohort_wk"))
      .groupBy("cohort_wk").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val atZero = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(atZero == cohortSizes)
    // no offset can exceed its cohort's size
    got.foreach { case (wk, _, n) => assert(n <= cohortSizes(wk)) }
  }

  test("pipeline_stratified_sample: exact ceil(n/5) quota per source, rerun-stable") {
    val got = SparkEntry.queries("pipeline_stratified_sample")(spark, sf)
    val perSource = got.groupBy("source").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    val totals = sources.Tables(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(perSource.keySet == totals.keySet)
    totals.foreach { case (src, n) =>
      assert(perSource(src) == (n + 4) / 5, s"$src: n=$n")
    }
    // determinism: a second evaluation selects the identical doc set
    val a = got.select("doc_id").as[Long].collect().toSet
    val b = SparkEntry.queries("pipeline_stratified_sample")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("pipeline_token_budget: selections respect the budget and are non-empty") {
    val got = SparkEntry.queries("pipeline_token_budget")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (src, k, toks, worst) =>
      assert(k > 0, src)
      assert(toks <= 500, s"$src used $toks > budget")
      assert(worst >= 0.0 && worst <= 1.0)
    }
  }

  test("text_novelty: earliest doc is fully novel, counts are coherent") {
    val rows = SparkEntry.queries("text_novelty")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nGrams, nNovel, nov) =>
      assert(nNovel <= nGrams)
      assert(nov >= 0.0 && nov <= 1.0)
      if (nGrams > 0)
        assert(math.abs(nov - nNovel.toDouble / nGrams) < 1e-3)
    }
    // min doc_id can't share grams with any earlier doc
    val first = rows.minBy(_._1)
    assert(first._2 == 0 || first._4 == 1.0)
  }

  test("pipeline_attrition: ordered funnel stages chain and shrink") {
    val rows = SparkEntry.queries("pipeline_attrition")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq("1_min_tokens", "2_quality", "3_repetition"))
    rows.foreach { case (_, in, out, dropped) =>
      assert(out <= in); assert(dropped == in - out)
    }
    // each stage's survivors feed the next stage
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 == b._2)
      case _ =>
    }
    assert(rows.head._2 == sources.Tables(spark, sf, "documents").count())
  }

  test("cdc_compaction: applying the net ops reproduces the latest snapshot") {
    val feed = cdc.ChangeFeed.fromEvents(sources.Tables(spark, sf, "events"))
    // live keys per the compacted log: everything except net deletes and
    // cancelled INSERT…DELETE runs, valued at the run's final value
    val live = SparkEntry.queries("cdc_compaction")(spark, sf)
      .filter($"net_op" =!= "DELETE")
      .select($"table_name", $"pk", $"value")
      .as[(String, Long, Double)].collect().toSet
    val snapshot = cdc.Apply.latestSnapshot(feed)
      .select($"table_name", $"pk", $"value")
      .as[(String, Long, Double)].collect().toSet
    assert(live == snapshot)
    assert(live.nonEmpty)
    // net DELETEs are exactly the pre-existing keys whose last op deletes
    val netDeletes = SparkEntry.queries("cdc_compaction")(spark, sf)
      .filter($"net_op" === "DELETE").select($"table_name", $"pk")
      .as[(String, Long)].collect().toSet
    netDeletes.foreach(k => assert(!live.exists(r => (r._1, r._2) == k)))
  }

  test("emb_outliers: 3 per label, ordered ascending by rounded cosine") {
    val rows = SparkEntry.queries("emb_outliers")(spark, sf)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val byLabel = rows.groupBy(_._1)
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (label, rs) =>
      assert(rs.map(_._2).sorted == Seq(1L, 2L, 3L), s"label $label")
      val cosInRankOrder = rs.sortBy(_._2).map(_._4)
      assert(cosInRankOrder == cosInRankOrder.sorted, s"label $label order")
      cosInRankOrder.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
    }
  }

  test("dedup_keep_list: one keep per cluster, and it has the best quality") {
    val rows = SparkEntry.queries("dedup_keep_list")(spark, sf)
      .as[(Long, Long, Double, Boolean, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.size >= 2, s"cluster $cluster: singletons never cluster")
      val kept = members.filter(_._4)
      assert(kept.size == 1, s"cluster $cluster keeps ${kept.size}")
      val winner = kept.head
      assert(members.forall(_._5 == winner._1), s"cluster $cluster pointer")
      // winner quality is maximal; doc_id breaks ties
      members.foreach { m =>
        assert(m._3 < winner._3 ||
          (m._3 == winner._3 && m._1 >= winner._1), s"cluster $cluster order")
      }
    }
  }

  test("pipeline_shard_manifest: shards partition the corpus exactly") {
    val rows = SparkEntry.queries("pipeline_shard_manifest")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.forall(r => r._1 >= 0 && r._1 < 8))
    val docs = sources.Tables(spark, sf, "documents")
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.map(_._3).sum ==
      docs.agg(sum($"n_chars")).as[Long].head())
    rows.foreach { case (_, n, _, lo, hi) => assert(lo <= hi && n >= 1) }
  }

  test("cdc_gap_detect: events total, interleaved tables gap, no dup LSNs") {
    val rows = SparkEntry.queries("cdc_gap_detect")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("accounts", "users"))
    val feed = cdc.ChangeFeed.fromEvents(sources.Tables(spark, sf, "events"))
    assert(rows.map(_._2).sum == feed.count())
    rows.foreach { case (t, n, lo, hi, gaps, maxGap, dups) =>
      assert(lo <= hi, t)
      assert(dups == 0L, s"$t: LSNs are unique by construction")
      // two tables interleave one global LSN sequence — each must see gaps
      assert(gaps > 0 && maxGap >= 1, t)
      // span = events + holes: total gap mass is span - count
      assert(hi - lo + 1 >= n, t)
    }
  }

  test("text_vocab_stats: ratios bounded, token totals match a recount") {
    val rows = SparkEntry.queries("text_vocab_stats")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nTok, nTyp, ttr, head) =>
      assert(nTyp >= 1 && nTyp <= nTok, src)
      assert(ttr > 0.0 && ttr <= 1.0, src)
      assert(head > 0.0 && head <= 1.0, src)
      // the top-10 types' mean count is >= the overall mean count, so
      // head mass >= 10/n_types (1.0 when fewer than 10 types); 1e-3
      // slack for the 4dp rounding
      assert(head >= math.min(1.0, 10.0 / nTyp) - 1e-3, src)
    }
  }

  test("text_tfidf: ranks 1..3 per doc ordered by the recomputed score") {
    val nDocs = sources.Tables(spark, sf, "documents").count()
    val rows = SparkEntry.queries("text_tfidf")(spark, sf)
      .select("doc_id", "rk", "term", "tf", "df")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    rows.foreach { case (_, rk, _, tf, df) =>
      assert(rk >= 1 && rk <= 3); assert(tf >= 1); assert(df >= 1 && df <= nDocs)
    }
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.size).toSeq, s"doc $doc ranks")
      val keyed = rs.sortBy(_._2).map { case (_, _, term, tf, df) =>
        (tf * (nDocs + 1.0) / (df + 1.0), term)
      }
      // rank order = (score desc, term asc)
      val expected = keyed.sortBy { case (sc, t) => (-sc, t) }
      assert(keyed == expected, s"doc $doc out of order")
    }
  }

  test("text_zipf_fit: matches a driver-side reference regression") {
    val rows = SparkEntry.queries("text_zipf_fit")(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // independent reference model: token counts per source in plain Spark,
    // top-100 + regression re-derived in Scala doubles (no integer-grid
    // trick, no TopKAgg) — the query must land within rounding distance
    val ref = sources.Tables(spark, sf, "documents")
      .select($"source", explode(split(trim(lower($"text")), "\\s+")).as("tok"))
      .filter($"tok" =!= "").groupBy("source", "tok").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (src, ts) =>
        val top = ts.map(_._3).sortBy(-_).take(100)
        val xy = top.zipWithIndex.map { case (c, i) =>
          (math.log(i + 1.0), math.log(c.toDouble)) }
        val n = xy.length.toDouble
        val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
        val sxx = xy.map(p => p._1 * p._1).sum
        val sxy = xy.map(p => p._1 * p._2).sum
        val syy = xy.map(p => p._2 * p._2).sum
        val (cov, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        (src, (top.length, cov / vx, cov * cov / (vx * vy)))
      }
    rows.foreach { case (src, nTerms, slope, r2) =>
      val (refN, refSlope, refR2) = ref(src)
      assert(nTerms == refN, src)
      // ties and the ln(·)·1e6 grid move the fit by far less than 1e-3
      assert(math.abs(slope - refSlope) < 1e-3, s"$src slope $slope vs $refSlope")
      assert(math.abs(r2 - refR2) < 1e-3, s"$src r2 $r2 vs $refR2")
      assert(slope <= 0.0, s"$src: freq non-increasing in rank")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, src)
    }
  }

  test("pipeline_epoch_mix: exact copy counts vs a driver-side md5 replay") {
    val rows = SparkEntry.queries("pipeline_epoch_mix")(spark, sf)
      .as[(String, Double, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val ref = sources.Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).map { case (src, ds) =>
        val u = 1 + (scala.util.Try(src.drop(3).toInt).toOption.map(_ % 5).getOrElse(0))
        val stats = ds.map { case (_, text) =>
          val hex = md.synchronized {
            md.reset(); md.digest((text + ":epoch").getBytes("UTF-8"))
              .take(2).map(b => f"$b%02x").mkString
          }
          val copies = u / 2 + (if (u % 2 == 1 && hex < "8000") 1 else 0)
          val toks = { val t = text.trim
            if (t.isEmpty) 0L else t.split("\\s+").length.toLong }
          (copies.toLong, copies * toks)
        }
        (src, (u / 2.0, ds.length.toLong, stats.map(_._1).sum, stats.map(_._2).sum))
      }
    rows.foreach { case (src, f, nDocs, nCopies, mixedToks, achieved) =>
      val (refF, refN, refCopies, refToks) = ref(src)
      assert(f == refF && nDocs == refN, src)
      assert(nCopies == refCopies, s"$src copies")
      assert(mixedToks == refToks, s"$src tokens")
      // hard bounds: floor(f)·n ≤ copies ≤ floor(f)·n + n
      val base = (f * 2).toLong / 2 * nDocs
      assert(nCopies >= base && nCopies <= base + nDocs, src)
      assert(math.abs(achieved - nCopies.toDouble / nDocs) < 1e-4, src)
    }
  }
}
