package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Relational
import graft.sources.Tables

/** Similarity-search inventory (SURVEY.md §2): embedding near-dup pairs,
  * brute-force cosine top-k (correctness baseline), and the LSH-bucketed
  * variant that is the 100 TB scale path.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.sharded(s, dir, "embeddings")

  /** Bounded query sample: small, deterministic, broadcast side of the
    * top-k search. At scale the query set is always << the corpus. */
  private val nQueries = 5
  private val topK = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Embedding-cosine near-dup pairs via hyperplane-LSH buckets: only
    // vectors agreeing on a 12-bit signature get compared (no cross join).
    "dedup_embedding" -> ((s, dir) => {
      val sigged = emb(s, dir).select(col("vec_id"), col("embedding"),
        Vectors.hyperplaneSig(col("embedding"), 8).as("sig")).persist()
      sigged.as("a").join(sigged.as("b"),
          col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
        // the synthetic embeddings are near-orthogonal (max pairwise cosine
        // ≈0.46 at sf0.01), so "near"-dup here means the top of that range
        .withColumn("cos", round(Vectors.cosine(col("a.embedding"), col("b.embedding")), 4))
        .filter(col("cos") >= 0.25)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // Brute-force cosine top-k: exact baseline; query side broadcast so the
    // corpus is scanned once with no shuffle before the per-query top-k.
    "knn_bruteforce" -> ((s, dir) => {
      val base = emb(s, dir)
      val q = base.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = base.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(Vectors.cosine(col("q_emb"), col("embedding")), 4).as("cos"))
      Relational.topKPerGroup(scored, Seq("q_id"),
          Seq(col("cos").desc, col("neighbor_id")), topK)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("neighbor_id"), col("cos"))
        .orderBy("q_id", "rk")
    }),

    // LSH-bucketed ANN: compare only within matching 8-bit hyperplane
    // buckets — the recall/throughput trade the scale path makes.
    "knn_lsh" -> ((s, dir) => {
      val sigged = emb(s, dir).select(col("vec_id"), col("embedding"),
        Vectors.hyperplaneSig(col("embedding"), 8).as("sig"))
      val q = sigged.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("sig").as("q_sig"))
      val scored = sigged.join(broadcast(q),
          col("sig") === col("q_sig") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(Vectors.cosine(col("q_emb"), col("embedding")), 4).as("cos"))
      Relational.topKPerGroup(scored, Seq("q_id"),
          Seq(col("cos").desc, col("neighbor_id")), topK)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("neighbor_id"), col("cos"))
        .orderBy("q_id", "rk")
    }))

  val oracles: Map[String, String] = Map.empty
}
