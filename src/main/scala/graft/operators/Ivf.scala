package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbor: spherical k-means coarse
  * quantizer, inverted lists keyed by cluster, probe-then-rerank queries —
  * the other classic ANN scale path next to hyperplane LSH (`knn_lsh`).
  *
  * Scale shape: centroids are tiny by construction (k × dim) and ride a
  * broadcast everywhere; the corpus is scanned map-side per Lloyd iteration
  * (codegen'd cosine against the broadcast centroids, partial-agg argmax —
  * the only shuffle is the (cluster, dim) centroid update, bounded by
  * k × dim, not the corpus). The final assignment is the inverted-list
  * index: at 100 TB it is written bucketed by `cluster`, so a query probing
  * nprobe lists reads nprobe/k of the corpus and nothing else.
  */
object Ivf {

  /** Spherical k-means (cosine argmax) with deterministic init: the k
    * lowest-id vectors seed the centroids, so re-runs and re-shards build
    * the identical quantizer. */
  def kmeansCentroids(e: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val corpus = e.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    var centroids = corpus.orderBy("vec_id").limit(k)
      .withColumn("cluster",
        row_number().over(Window.orderBy("vec_id")).cast("int") - 1)
      .select(col("cluster"), col("embedding").as("centroid"))
      .transform(Checkpointing.cut)
    var i = 0
    while (i < iters) {
      centroids = Embeddings
        .labelCentroids(assign(corpus, centroids), "cluster", "embedding")
        .select(col("label").as("cluster"), col("centroid"))
        .transform(Checkpointing.cut)
      i += 1
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast cross join + codegen'd cosine +
    * map-side-combined argmax. Ties break toward the lowest cluster id so
    * assignment is deterministic. */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val s = corpus.sparkSession
    corpus.crossJoin(broadcast(centroids))
      .withColumn("sim",
        graft.plans.CosineSim.cosine(s, col("embedding"), col("centroid")))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"),
        max_by(col("cluster"), struct(col("sim"), -col("cluster"))).as("cluster"))
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
