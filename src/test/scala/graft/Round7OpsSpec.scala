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
}
