package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Crafted-input specs for the round-7 additions the oracle gate can't
  * isolate: the importance sampler's estimator law (realized keeps track
  * the expected quality mass) and its determinism/monotonicity contract.
  * (q_sketch_setops laws live in KmvSpec; the concurrency sweep's in
  * RelationalOpsSpec.)
  */
class Round7OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("importance sample: realized keeps track expected quality mass") {
    val rows = SparkEntry.queries("pipeline_importance_sample")(spark, sf)
      .select("source", "n_docs", "n_kept", "expected_kept").collect()
    assert(rows.nonEmpty)
    val (kept, expected, n) = rows.foldLeft((0L, 0.0, 0L)) { (acc, r) =>
      (acc._1 + r.getAs[Long]("n_kept"),
        acc._2 + r.getAs[Double]("expected_kept"),
        acc._3 + r.getAs[Long]("n_docs"))
    }
    assert(kept > 0 && kept < n, "sampler must keep SOME but not all docs")
    // corpus-level: n_kept is a sum of independent Bernoulli(q_i) coins
    // with mean = expected_kept; allow 5 sigma of the binomial bound
    val sigma = math.sqrt(n.toDouble) / 2.0
    assert(math.abs(kept - expected) <= 5 * sigma,
      s"realized $kept vs expected $expected (n=$n) outside 5-sigma")
  }

  test("importance sample: keep decision is a pure function of the bytes") {
    // a doc's fate cannot depend on partitioning, row order, or the rest
    // of the corpus — re-deriving the flag on a shuffled, truncated copy
    // must agree row-for-row with the full-corpus derivation
    val two48 = 281474976710656.0
    def flags(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        (conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long") <
          round(graft.functions.Text.qualityScore(col("text")) * lit(two48))
            .cast("long")).as("keep"))
    val docs = graft.sources.Tables(spark, sf, "documents")
    val full = flags(docs).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val shuffled = flags(docs.repartition(7).limit(200))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    shuffled.foreach { case (id, k) => assert(full(id) == k, s"doc $id flipped") }
  }

  test("bm25: tf saturates, longer docs score lower, absent terms score zero") {
    import graft.functions.Text
    // (tf, dl) rows against fixed corpus stats: N = 100 docs, avgdl = 50
    val rows = Seq((0L, 50L), (1L, 50L), (2L, 50L), (10L, 50L), (100L, 50L),
        (2L, 200L))
      .toDF("tf", "dl")
      .select(col("tf"), col("dl"),
        Text.bm25Contrib(col("tf"), lit(20L), col("dl"),
          lit(100L), lit(5000L)).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byKey = rows.map { case (tf, dl, sv) => (tf, dl) -> sv }.toMap
    assert(byKey((0L, 50L)) == 0.0)
    // monotone in tf…
    assert(byKey((1L, 50L)) < byKey((2L, 50L)))
    assert(byKey((2L, 50L)) < byKey((10L, 50L)))
    // …but SATURATING: 100 occurrences gain < 20% over 10 — and both stay
    // under the k1+1 asymptote × idf
    val asymptote = (100.0 + 1.0) / (20.0 + 1.0) * 2.2
    assert(byKey((100L, 50L)) < byKey((10L, 50L)) * 1.2)
    assert(byKey((100L, 50L)) < asymptote)
    // doc-length normalization: same tf, 4× the length → lower score
    assert(byKey((2L, 200L)) < byKey((2L, 50L)))
  }

  test("text_bm25: ranks are contiguous and scores non-increasing") {
    val rows = SparkEntry.queries("text_bm25")(spark, sf)
      .select("rank", "bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a >= b)
      case _ => () }
  }

  test("q_rolling_distinct: window ramps, estimates track the exact audit") {
    val rows = SparkEntry.queries("q_rolling_distinct")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    // leading edge: window width ramps 1,2,…,7 then stays 7 (contiguous days)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_days") == math.min(i + 1, 7).toLong)
    }
    // KMV envelope (k=64 ⇒ σ ≈ 12.7%): every window estimate within 4σ
    rows.foreach { r =>
      val est = r.getAs[Double]("kmv_rolling_users")
      val exact = r.getAs[Long]("exact_rolling_users").toDouble
      assert(math.abs(est - exact) / exact <= 0.51,
        s"day ${r.getAs[Long]("day")}: $est vs $exact")
    }
  }

  test("pcaTop: recovers a planted dominant direction") {
    // corpus = strong variance along axis 0, weak noise along axis 1
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10  // mean-zero spread, ±10 along axis 0
      val n = ((i * 7) % 5) - 2 // ±2 along axis 1
      (i.toLong, Array(t.toFloat * 1.0f, n.toFloat * 0.1f, 0.0f, 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (mu, v, _) = graft.operators.Embeddings.pcaTop(df, "vec_id", "embedding", 2)
    assert(mu.length == 4 && v.length == 4)
    // unit norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    // dominant axis recovered: |v₀| ≈ 1, the rest negligible
    assert(math.abs(v.head) > 0.99, s"loading on planted axis: ${v.head}")
    assert(v.tail.forall(x => math.abs(x) < 0.1))
  }

  test("emb_pca: unit loading vector, variance share in (0, 100]") {
    val rows = SparkEntry.queries("emb_pca")(spark, sf).collect()
    assert(rows.nonEmpty)
    // floor-quantized loadings still ~unit norm (quantization error ≤ dim·1e-4)
    val nsq = rows.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(nsq - 1.0) < 0.05, s"loading norm² $nsq")
    val pct = rows.head.getAs[Double]("var_explained_pct")
    assert(pct > 0.0 && pct <= 100.0)
    assert(rows.forall(_.getAs[Double]("var_explained_pct") == pct))
  }

  test("knn_ivf_stats: lists partition the corpus, cohesion is a cosine") {
    val rows = SparkEntry.queries("knn_ivf_stats")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val total = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total,
      "inverted lists must partition the corpus exactly")
    val pctSum = rows.map(_.getAs[Double]("pct_of_corpus")).sum
    assert(math.abs(pctSum - 100.0) < 0.01)
    rows.foreach { r =>
      val c = r.getAs[Double]("mean_cos_to_centroid")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("importance sample: zero-quality docs are never kept") {
    // q = 0 ⇒ threshold round(0·2^48) = 0 ⇒ h < 0 impossible (md5-derived
    // hashes are non-negative) — the boundary semantics of the integer
    // compare, pinned so a future >= regression fails here
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val q = graft.functions.Text.qualityScore(col("text"))
    val kept = df.select(
        (conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long") <
          round(q * lit(281474976710656.0)).cast("long")).as("keep"))
      .filter(col("keep")).count()
    assert(kept == 0L)
  }

  test("q_gap_fill: contiguous per-user spine, fills carry the last close") {
    val rows = SparkEntry.queries("q_gap_fill")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted.toSeq
      assert((days.head to days.last).toSeq == days, s"user $u spine has holes")
      // walk the fill: a filled row must repeat the previous row's value,
      // the first row is never a fill (day0 = a real event day)
      val ordered = rs.sortBy(_._2)
      assert(!ordered.head._4, s"user $u starts with a filled row")
      ordered.sliding(2).foreach {
        case Array((_, _, prev, _), (_, d, v, filled)) =>
          if (filled) assert(v == prev, s"user $u day $d fill broke the carry")
        case _ =>
      }
    }
    // fills exist at this SF (494 gap days at sf0.01; > 0 here too) and
    // real rows equal the distinct (user, day) count of the raw events
    assert(rows.count(_._4) > 0, "no gap was ever filled — vacuous")
    val e = graft.sources.Tables(spark, sf, "events")
    val realDays = e.withColumn("ts_us", graft.sources.Tables.tsMicros(e))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().count()
    assert(rows.count(!_._4) == realDays)
  }

  test("q_decay_agg: decayed mass is positive and never exceeds raw mass") {
    val e = graft.sources.Tables(spark, sf, "events")
    val raw = e.groupBy("event_type")
      .agg(sum(round(col("value") * 10000).cast("long")).as("raw4"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1) / 10000.0, r.getLong(2))).toMap
    val rows = SparkEntry.queries("q_decay_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val ds = r.getAs[Double]("decayed_sum")
      val (rawSum, rawN) = raw(t)
      assert(n == rawN)
      assert(ds > 0.0 && ds <= rawSum + 1e-6,
        s"$t decayed $ds outside (0, raw=$rawSum]")
      // half-life bound: everything is ≤ 5 weeks old in the lake, so the
      // decayed mass keeps at least 2^-5 of the raw mass
      assert(ds >= rawSum / 32.0 - 1e-6, s"$t decayed $ds below the 2^-5 floor")
    }
  }

  test("q_attribution: channels partition all purchases, shares sum to one") {
    val rows = SparkEntry.queries("q_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "signup", "direct")))
    val e = graft.sources.Tables(spark, sf, "events")
    val purchases = e.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == purchases)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3 * rows.length)
  }

  test("emb_hard_negatives: labels differ, ranks contiguous, cos ordered") {
    val rows = SparkEntry.queries("emb_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, aLab, _, _, nLab, _) =>
      assert(aLab != nLab, "a hard negative shares the anchor's label") }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRk = rs.sortBy(_._3)
      assert(byRk.map(_._3).toSeq == (1L to byRk.length))
      assert(byRk.map(_._6).toSeq == byRk.map(_._6).sorted.reverse.toSeq,
        s"anchor $q cos not non-increasing")
    }
    // the hardest negative can never beat the unconstrained top neighbor
    val top = SparkEntry.queries("knn_bruteforce")(spark, sf)
      .filter(col("rk") === 1).select("q_id", "cos")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.filter(_._3 == 1L).foreach { case (q, _, _, _, _, c) =>
      assert(c <= top(q) + 1e-9) }
  }

  test("q_zscore_outliers: nonempty, every flagged |z| clears 3 sigma") {
    val rows = SparkEntry.queries("q_zscore_outliers")(spark, sf).collect()
    assert(rows.nonEmpty, "heavy-tailed lake must flag outliers — vacuous")
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      // z is floor-quantized to 4dp, so the cut admits values whose
      // quantization lands just at ±3
      assert(math.abs(z) >= 3.0 - 1e-4, s"event ${r.getLong(0)} z=$z")
      assert(!z.isNaN && !z.isInfinite)
    }
  }

  test("text_bpe_pairs: 20 rows of 2-char pairs, counts non-increasing") {
    val rows = SparkEntry.queries("text_bpe_pairs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    rows.foreach { case (p, n) => assert(p.length == 2 && n > 0) }
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
  }

  test("q_drawdown: drawdown non-negative, bounded by peak span, events conserved") {
    val rows = SparkEntry.queries("q_drawdown")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dd, peak) = (r.getAs[Double]("max_drawdown"), r.getAs[Double]("peak_value"))
      assert(dd >= 0.0, "a running max can never sit below the running sum")
      // peak ≥ first prefix sum > 0 for positive-valued events
      assert(peak > 0.0)
    }
    val e = graft.sources.Tables(spark, sf, "events")
    assert(rows.map(_.getAs[Long]("n_events")).sum == e.count())
  }

  test("q_cohort_ltv: cumulative LTV is non-decreasing within each cohort") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("revenue"), r.getAs[Double]("cum_ltv_per_user")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, rs) =>
      val ordered = rs.sortBy(_._2)
      val ltvs = ordered.map(_._4).toSeq
      assert(ltvs == ltvs.sorted, s"cohort $ck LTV curve decreased: $ltvs")
      ordered.foreach { case (_, _, rev, _) => assert(rev > 0.0) }
    }
  }

  test("cusum changepoint: planted level shift is found at its boundary") {
    // series: 20 flat lows then 20 flat highs → |n·prefix − i·S| peaks
    // exactly at the last low (the textbook cusum V-shape vertex)
    import spark.implicits._
    val evs = (1 to 40).map(i =>
      (i.toLong, i.toLong * 1000L, "m", if (i <= 20) 10.0 else 30.0))
      .toDF("event_id", "ts_us", "event_type", "value")
    val e = evs.withColumn("vc", round(col("value") * lit(100)).cast("long"))
      .withColumn("one", lit(1L))
    val order = Seq(col("ts_us"), col("event_id"))
    val withCum = graft.operators.PrefixSum.cumSum(
      graft.operators.PrefixSum.cumSum(e, "event_type", order, "vc", "cum"),
      "event_type", order, "one", "idx")
    val stats = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vc").as("s"))
    val top = withCum.join(stats, "event_type")
      .withColumn("cusum", col("n").cast("decimal(38,0)") * col("cum") -
        col("idx").cast("decimal(38,0)") * col("s"))
      .orderBy(abs(col("cusum")).desc, col("ts_us")).limit(1)
      .select("event_id").head().getLong(0)
    assert(top == 20L, s"changepoint landed at $top, expected the shift edge")
  }

  test("text_readability: counts sane, band cuts on the quantized ari") {
    val rows = SparkEntry.queries("text_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (letters, words, sents) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ari, band) = (r.getAs[Double]("ari"), r.getString(6))
      assert(letters >= words && words > 0 && sents >= 1,
        "letters < words or empty doc slipped the filter")
      val expected = if (ari < 8) "easy" else if (ari < 16) "medium" else "hard"
      assert(band == expected, s"band $band vs ari $ari")
    }
  }
}
