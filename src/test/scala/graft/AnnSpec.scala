package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashes, Text, Vectors}

class AnnSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("multi-table LSH recovers planted near-duplicate vectors") {
    // 40 random-ish base vectors; for the first 5, plant a noisy copy
    // (high cosine). Multi-table LSH must bucket each planted pair together
    // in at least one of the 4 tables for >= 4/5 queries.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(32)(j => (((seed * 31 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    def noisy(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j % 7 == 0) 0.05f else 0f) }
    val base = (0 until 40).map(i => (i.toLong, vec(i + 1)))
    val planted = (0 until 5).map(i => (100L + i, noisy(vec(i + 1))))
    val df = (base ++ planted).toDF("vec_id", "embedding")
      .select($"vec_id", Vectors.hyperplaneSigs($"embedding", 8, 4).as("sigs"))
    val b = df.select($"vec_id", posexplode($"sigs").as(Seq("t", "sig")))
    val pairs = b.as("a").join(b.as("b"),
        $"a.t" === $"b.t" && $"a.sig" === $"b.sig" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id").distinct()
      .as[(Long, Long)].collect().toSet
    val recovered = (0 until 5).count(i => pairs.contains((i.toLong, 100L + i)))
    assert(recovered >= 4, s"recovered only $recovered/5 planted pairs")
  }

  test("nearDupPairs recovers planted near-duplicates and verifies with exact cosine") {
    // Same planted-pair setup as the LSH spec, but through the full dedup
    // operator: adaptive-bits bucketing, multi-table union, cosine verify.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(32)(j => (((seed * 31 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    def noisy(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j % 7 == 0) 0.05f else 0f) }
    val base = (0 until 40).map(i => (i.toLong, vec(i + 1)))
    val planted = (0 until 5).map(i => (100L + i, noisy(vec(i + 1))))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val out = graft.operators.Embeddings
      .nearDupPairs(df, "vec_id", "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    val recovered = (0 until 5).count(i => pairs.contains((i.toLong, 100L + i)))
    assert(recovered >= 4, s"recovered only $recovered/5 planted pairs")
    // verify stage is real: every emitted pair clears the exact threshold
    assert(out.forall(_._3 >= 0.9), "pair below cosine threshold leaked through verify")
  }

  test("adaptive signature bits track corpus size, clamped to [8, 24]") {
    import graft.operators.Embeddings.adaptiveBits
    assert(adaptiveBits(500L, 32) == 8)          // small corpus floors at 8
    assert(adaptiveBits(1L << 20, 32) == 15)     // 1M rows / 32 = 2^15 buckets
    assert(adaptiveBits(1_000_000_000L, 32) == 24) // billions cap at 24
    assert(adaptiveBits(0L, 32) == 8)            // empty corpus: no log(0)
  }

  test("IVF probe-and-rerank recovers planted near-duplicates") {
    def vec(seed: Int): Array[Float] =
      Array.tabulate(32)(j => (((seed * 31 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    def noisy(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, j) => x + (if (j % 7 == 0) 0.05f else 0f) }
    val base = (0 until 40).map(i => (i.toLong, vec(i + 1)))
    val planted = (0 until 5).map(i => (100L + i, noisy(vec(i + 1))))
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.kmeansCentroids(corpus, "vec_id", "embedding", k = 8, iters = 2)
    val index = graft.operators.Ivf.assign(corpus, centroids)
    // quantizer partitions the corpus completely and deterministically
    assert(index.count() == 45)
    val q = planted.toDF("q_id", "q_emb")
    val top = graft.operators.Ivf.knn(index, centroids, q, nprobe = 2, topK = 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the noisy copy's nearest list almost always holds its base vector
    val recovered = (0 until 5).count(i => top.getOrElse(100L + i, Set.empty).contains(i.toLong))
    assert(recovered >= 4, s"IVF recovered only $recovered/5 planted pairs")
  }

  test("map-side IVF assign matches the reference crossJoin argmax plan") {
    // Ivf.assign must be a drop-in for the join+max_by plan it replaced:
    // same winning cluster per vector (incl. lowest-cluster-id tie-breaks),
    // computed from bit-identical cosine scores.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(32)(j => (((seed * 31 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    val corpus = (0 until 60).map(i => (i.toLong, vec(i + 1))).toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.kmeansCentroids(corpus, "vec_id", "embedding", k = 8, iters = 1)
    val fast = graft.operators.Ivf.assign(corpus, centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val ref = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim",
        graft.plans.CosineSim.cosine(spark, $"embedding", $"centroid"))
      .groupBy("vec_id")
      .agg(max_by($"cluster", struct($"sim", -$"cluster")).as("cluster"))
      .as[(Long, Int)].collect().toMap
    assert(fast == ref)
  }

  test("IVF assign plans with no Exchange between scan and cluster column") {
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(j => (((seed * 31 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    val corpus = (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val centroids = (0 until 4)
      .map(c => (c, Array.tabulate(16)(j => vec(c * 7 + 1)(j).toDouble)))
      .toDF("cluster", "centroid")
    val plan = graft.operators.Ivf.assign(corpus, centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
  }

  test("knn_lsh candidate join broadcasts the query side (no corpus shuffle)") {
    // the scale contract of the LSH probe: the tiny query bucket set rides
    // a broadcast hash join, so candidate generation never exchanges the
    // exploded corpus buckets. Lint the uncut construction — the served
    // query reads the memoized artifact, whose lineage cut hides the join.
    val df = graft.queries.VectorQueries.lshScoredPlan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    // the contract is that NO join shuffles the corpus side — a lost
    // broadcast hint shows up as a sort-merge or shuffled-hash join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"candidate join shuffled the corpus:\n$plan")
    assert(df.count() > 0)
  }

  test("PQ encode/ADC: donors code to themselves, near-dups score closest") {
    // codebook = subvectors of the 4 lowest-id vectors (m=4 subspaces of
    // 4 dims, K=4); a donor's nearest sub-centroid in every subspace is its
    // own subvector (distance exactly 0), and ADC against its own codes is
    // exactly 0. A planted noisy copy of vector 1 must beat every other
    // vector's ADC for query 1 — the compressed-domain scan preserves the
    // near-dup ranking the exact rerank then confirms.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(j => (((seed * 37 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    val m = 4
    val base = (0 until 12).map(i => (i.toLong, vec(i + 1)))
    val planted = Seq((30L, vec(2).zipWithIndex.map { case (x, j) =>
      x + (if (j % 5 == 0) 0.03f else 0f) }))
    val cbVecs = base.take(4).map(_._2.map(_.toDouble))
    val cb: Seq[Seq[Double]] = for {
      s <- 0 until m
      c <- 0 until 4
    } yield cbVecs(c).slice(s * 4, (s + 1) * 4).toSeq
    val cbLit = typedLit(cb)
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val codes = df.select($"vec_id", $"embedding",
      graft.plans.Pq.encode(spark, $"embedding", cbLit, m).as("codes"))
    val donors = codes.filter($"vec_id" < 4)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
    donors.foreach { case (id, cs) =>
      assert(cs.forall(_ == id.toInt), s"donor $id coded as $cs, not itself")
    }
    val q1 = df.filter($"vec_id" === 1L).select($"embedding".as("q_emb"))
    val adcs = codes.crossJoin(q1)
      .select($"vec_id",
        graft.plans.Pq.adc(spark, $"q_emb", $"codes", cbLit, m).as("adc"))
      .as[(Long, Double)].collect().toMap
    assert(adcs(1L) == 0.0, s"self-ADC must be exactly 0, got ${adcs(1L)}")
    // quantized ties are legal PQ behavior (any vector coded like the query
    // scores 0) — the compressed scan must put the planted copy AT the
    // front, and the exact rerank then separates it from tied coarse codes
    val others = adcs.filter { case (id, _) => id != 1L && id != 30L }.values
    assert(others.forall(_ >= adcs(30L)),
      s"planted copy adc=${adcs(30L)} beaten: ${adcs.toSeq.sortBy(_._2).take(3)}")
    val cosines = df.crossJoin(q1)
      .select($"vec_id",
        graft.plans.CosineSim.cosine(spark, $"q_emb", $"embedding").as("cos"))
      .as[(Long, Double)].collect().toMap
    val bestOther = cosines.filter { case (id, _) => id != 1L && id != 30L }.values.max
    assert(cosines(30L) > bestOther,
      s"exact rerank would not surface the planted copy: ${cosines(30L)} vs $bestOther")
    // malformed-but-well-typed args must fail loudly, not read unchecked
    // UnsafeArrayData offsets: code 9 is out of range for K=4
    val bad = df.limit(1).select(
      graft.plans.Pq.adc(spark, $"embedding", typedLit(Seq(0, 0, 0, 9)), cbLit, m).as("d"))
    val err = intercept[Exception](bad.collect())
    assert(err.toString.contains("out of range") ||
      (err.getCause != null && err.getCause.toString.contains("out of range")), err.toString)
  }

  test("vec_sub subtracts elementwise and rejects length mismatches") {
    val df = Seq((Array(1.0f, 2.5f, -3.0f), Seq(0.5, 2.5, 1.0))).toDF("a", "b")
    val out = df.select(graft.plans.VecSub.sub(spark, $"a", $"b").as("d"))
      .as[Seq[Double]].head()
    assert(out == Seq(0.5, 0.0, -4.0))
    // a length mismatch must fail loudly, not silently truncate the residual
    val bad = Seq((Array(1.0f, 2.0f), Seq(1.0))).toDF("a", "b")
    val err = intercept[Exception](
      bad.select(graft.plans.VecSub.sub(spark, $"a", $"b")).collect())
    assert(err.toString.contains("length mismatch") ||
      (err.getCause != null && err.getCause.toString.contains("length mismatch")),
      err.toString)
  }

  test("pq_encode with m=1 IS nearest-centroid-by-L2 (driver argmin parity)") {
    // the knn_ivfpq coarse stage: one-subspace PQ encode ≡ argmin of the
    // full-vector squared L2 distance with lowest-cluster ties — checked
    // against a driver-side left-fold replay on a synthetic corpus
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(j => (((seed * 41 + j) * 2654435761L % 1000) / 500.0 - 1.0).toFloat)
    val cents: Seq[Seq[Double]] = (0 until 8).map(i => vec(i + 50).map(_.toDouble).toSeq)
    val df = (0 until 60).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        element_at(graft.plans.Pq.encode(spark, $"embedding", typedLit(cents), 1), 1)
          .as("cluster"))
      .as[(Long, Int)].collect().toMap
    val exp = (0 until 60).map { i =>
      val v = vec(i).map(_.toDouble)
      val d2 = cents.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      i.toLong -> d2.zipWithIndex.minBy { case (d, c) => (d, c) }._2
    }.toMap
    assert(got == exp)
  }

  test("knn_ivfpq recall against the exact bruteforce top-k at sf0.001") {
    // nprobe=2 of 8 cells: the ANN answer must still recover a solid
    // fraction of the true top-10 — and every query must return rows
    val approx = SparkEntry.queries("knn_ivfpq")(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val exact = SparkEntry.queries("knn_bruteforce")(spark, sf)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(exact.keySet == approx.keySet, "query sets differ")
    val recalls = exact.map { case (q, rows) =>
      val truth = rows.map(_._2).toSet
      val got = approx(q).map(_._2).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean top-10 recall: $mean%.2f")
    assert(mean >= 0.6, f"mean recall $mean%.2f below floor (0.78 at authoring)")
  }

  test("knn_recall_audit: full exact denominator, consistent ratio per query") {
    val rows = SparkEntry.queries("knn_recall_audit")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty, "audit returned no query rows")
    rows.foreach { case (q, nEx, nHit, rec) =>
      assert(nEx == 10L, s"q=$q graded against $nEx rows, expected the full top-10")
      assert(nHit >= 0L && nHit <= nEx, s"q=$q n_hit=$nHit out of range")
      assert(math.abs(rec - nHit.toDouble / nEx) < 1e-9, s"q=$q recall/$nHit mismatch")
    }
  }

  test("minhash similarity estimates true Jaccard within 0.15 mean abs error") {
    // 60 doc pairs with known overlap: pair i shares i tokens of 30
    val rows = (1 until 60).map { i =>
      val shared = (0 until i % 30).map(k => s"s${i}_$k")
      val a = shared ++ (0 until 30 - i % 30).map(k => s"a${i}_$k")
      val bb = shared ++ (0 until 30 - i % 30).map(k => s"b${i}_$k")
      val trueJ = shared.size.toDouble / (a.size + bb.size - shared.size)
      (a.mkString(" "), bb.mkString(" "), trueJ)
    }
    val df = rows.toDF("ta", "tb", "true_j")
    // 1-shingles = raw token sets (overlap is token-level here)
    val est = df.select(
      Hashes.minhashSimilarity(
        graft.plans.NativeHashes.minhashSig(spark, Text.wordShingles($"ta", 1), 128),
        graft.plans.NativeHashes.minhashSig(spark, Text.wordShingles($"tb", 1), 128))
        .as("est"), $"true_j")
      .select(abs($"est" - $"true_j").as("err"))
      .agg(avg("err")).as[Double].head()
    assert(est < 0.15, s"mean abs error $est")
  }

  test("emb_dedup_clusters: matches union-find over the pair relation") {
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    val got = SparkEntry.queries("emb_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // reference: plain union-find with min-id representatives
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(got.keySet == members.toSet, "every paired vector, nothing else")
    members.foreach { v =>
      val comp = members.filter(m => find(m) == find(v))
      assert(got(v) == comp.min, s"vec $v: canonical must be component min")
    }
  }

  test("emb_keep_list: one keeper per cluster, lowest (cos, vec_id) wins, no per-cluster window") {
    val df = SparkEntry.queries("emb_keep_list")(spark, sf)
    val rows = df.select($"vec_id", $"cluster", $"cos_to_centroid", $"keep")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (c, mem) =>
      val kept = mem.filter(_._4)
      assert(kept.size == 1, s"cluster $c: exactly one keeper, got ${kept.size}")
      // SemDeDup keep rule: the member closest to "least redundant" —
      // lowest rounded cosine to centroid, vec_id tie-break
      val want = mem.minBy(r => (r._3, r._1))
      assert(kept.head._1 == want._1,
        s"cluster $c: keeper ${kept.head._1} != argmin ${want._1}")
    }
    // the decision must come from the distributed argmin, not a window sort
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      "emb_keep_list must not plan a per-cluster window")
  }
}
