package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** IVF-flat approximate nearest neighbor: spherical k-means coarse
  * quantizer, inverted lists keyed by cluster, probe-then-rerank queries —
  * the other classic ANN scale path next to hyperplane LSH (`knn_lsh`).
  *
  * Scale shape: centroids are tiny by construction (k × dim) and ride the
  * plan as a literal; the corpus is scanned map-side per Lloyd iteration
  * (one codegen'd nearest-centroid argmax per row — no join, no exchange;
  * the only shuffle is the (cluster, dim) centroid update, whose partial
  * aggregation bounds exchange volume at k × dim per partition, not the
  * corpus). The final assignment is the inverted-list index: at 100 TB it
  * is written bucketed by `cluster`, so a query probing nprobe lists reads
  * nprobe/k of the corpus and nothing else.
  */
object Ivf {

  /** Spherical k-means (cosine argmax) with deterministic init: the k
    * lowest-id vectors seed the centroids, so re-runs and re-shards build
    * the identical quantizer.
    *
    * The Lloyd loop keeps centroid VALUES on the driver (k × dim, bounded —
    * the same small state a parameter-server round would hold): each
    * iteration is ONE job — map-side argmax assignment against the literal
    * centroids, then the (cluster, dim) mean collected back. No per-iteration
    * checkpoint, no lineage growth (every iteration's plan is corpus scan +
    * literal). The result is a local relation, so every downstream broadcast
    * of the centroids is free. */
  def kmeansCentroids(e: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val corpus = e.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    var cents: Seq[(Int, Seq[Double])] = corpus
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
      .orderBy("vec_id").limit(k).collect()
      .toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    val s = e.sparkSession
    var i = 0
    while (i < iters) {
      // one shuffle per iteration: VectorMeanAgg partial-aggregates each
      // partition's vectors into a single (sums, count) buffer per cluster,
      // so the exchange carries k buffers per partition, not k × dim rows
      // across two stages. The fold quantizes inputs at 1e-6 and sums
      // LONGS, so it is order-free: reruns, reshards and the DuckDB oracle
      // all reproduce the centroids bit-exactly (VectorMeanAgg scaladoc)
      cents = assignLiteral(corpus, cents)
        .groupBy("cluster")
        .agg(graft.plans.VectorMeanAgg.mean(s, col("embedding")).as("centroid"))
        .collect().toIndexedSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      i += 1
    }
    import s.implicits._
    cents.toDF("cluster", "centroid")
  }

  /** Map-side assignment against driver-held centroid values (see
    * [[assign]] for the plan-shape contract). */
  private def assignLiteral(corpus: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "assign needs at least one centroid")
    val s = corpus.sparkSession
    val sorted = cents.sortBy(_._1)
    val ids: Seq[Int] = sorted.map(_._1)
    val vecs: Seq[Seq[Double]] = sorted.map(_._2)
    corpus
      .withColumn("cluster", element_at(typedLit(ids),
        graft.plans.NearestCentroid.nearest(s, col("embedding"), typedLit(vecs)) + 1))
      .select(col("vec_id"), col("embedding"), col("cluster"))
  }

  /** Nearest-centroid assignment, fully map-side: the k × dim centroid set
    * is collected to the driver (the broadcast-literal analog — an O(k×dim)
    * action against an already-checkpointed tiny frame) and embedded in the
    * plan, so assignment is one codegen'd argmax per row
    * ([[graft.plans.NearestCentroid]]) with NO join and NO exchange between
    * the corpus scan and the cluster column. Ties break toward the lowest
    * cluster id so assignment is deterministic (bit-matched to the previous
    * crossJoin + `max_by(cluster, struct(sim, -cluster))` plan, which paid a
    * full-corpus shuffle per call). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val rows = centroids
      .select(col("cluster").cast("int"),
        col("centroid").cast(ArrayType(DoubleType)))
      .orderBy("cluster").collect()
    assignLiteral(corpus,
      rows.toIndexedSeq.map(r => (r.getInt(0), r.getSeq[Double](1))))
  }

  /** Probe-then-rerank top-k: each query scores the broadcast centroids,
    * probes its `nprobe` nearest inverted lists, and exact-cosine-reranks
    * only those lists' vectors. */
  def knn(index: DataFrame, centroids: DataFrame, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    val s = index.sparkSession
    val probes = Relational.topKPerGroup(
        queries.crossJoin(broadcast(centroids))
          .withColumn("sim",
            graft.plans.CosineSim.cosine(s, col("q_emb"), col("centroid"))),
        Seq("q_id"), Seq(col("sim").desc, col("cluster")), nprobe)
      .select(col("q_id"), col("q_emb"), col("cluster"))
    val scored = index.join(broadcast(probes),
        index("cluster") === probes("cluster") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(graft.plans.CosineSim.cosine(s, col("q_emb"), col("embedding")), 4).as("cos"))
    // bounded-heap rerank: the probed lists' scored rows partial-aggregate
    // map-side, so only ≤ k per query per partition reach the shuffle
    Relational.topKByScore(scored, "q_id", "cos", "neighbor_id", topK)
  }
}
