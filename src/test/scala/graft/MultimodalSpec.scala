package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asMedia assigns a deterministic modality mix; features are total") {
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val mix = media.groupBy("modality").count().as[(String, Long)].collect().toMap
    assert(mix.keySet == Set("image", "audio", "video"))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    assert(feats.filter($"n_bytes" <= 0 || $"width" <= 0 || $"height" <= 0).count() == 0)
  }

  test("sampleFrames: only video rows, 1-5 frames each, deterministic") {
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(spark, media)
    val perDoc = frames.groupBy("doc_id").count()
    assert(perDoc.filter($"count" < 1 || $"count" > 5).count() == 0)
    // every frame doc is a video doc (doc_id % 3 == 2 under the mix rule)
    assert(frames.filter(pmod($"doc_id", lit(3)) =!= 2).count() == 0)
    // deterministic across runs
    val again = Multimodal.sampleFrames(spark, media)
    assert(frames.exceptAll(again).isEmpty)
  }

  test("sampleFrames pushes the modality filter into the parquet scan") {
    // Over a real media lake (modality materialized as a column, as the
    // 100 TB layout stores it) the video filter must reach the scan — not
    // run as a typed filter after deserializing every modality.
    val dir = java.nio.file.Files.createTempDirectory("media_lake").toString
    Multimodal.asMedia(Tables(spark, sf, "documents"))
      .write.mode("overwrite").parquet(dir)
    val lake = spark.read.parquet(dir)
    val plan = Multimodal.sampleFrames(spark, lake)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(modality,video)"),
      s"modality filter not pushed into the scan:\n$plan")
  }

  test("labelCentroids: identical vectors give cohesion 1.0 (production op)") {
    val v = Array.tabulate(8)(_.toFloat + 1f)
    val df = Seq((0L, v, 1), (1L, v, 1), (2L, v.map(-_), 2)).toDF("vec_id", "embedding", "label")
    val centroids = graft.operators.Embeddings.labelCentroids(df, "label", "embedding")
    val cos = df.join(centroids, "label")
      .select(round(Vectors.cosine($"embedding", $"centroid"), 6).as("c"))
      .as[Double].collect()
    assert(cos.forall(_ == 1.0))
  }

  test("emb_centroids query: cohesion bounded, vector counts total") {
    val out = queries.VectorQueries.queries("emb_centroids")(spark, sf)
      .selectExpr("n_vectors", "mean_cos_to_centroid").as[(Long, Double)].collect()
    assert(out.map(_._1).sum == sources.Tables(spark, sf, "embeddings").count())
    assert(out.forall { case (_, c) => c > -1.0 && c <= 1.0 })
  }
}
