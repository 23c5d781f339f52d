package graft.tools

import org.apache.spark.sql.functions._

/** Pigeonhole bucket-size histogram per modality — the measurement behind
  * the r7 bounded-bucket cap: prints n, distinct buckets, max/p99 bucket
  * size and the candidate mass Σ n·(n−1)/2 per bucket, so the cap default
  * is chosen from data, not guessed.
  * `sbt "Test/runMain graft.tools.BucketProbe <sfDir>"` */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val feats = graft.operators.Multimodal.extractFeatures(spark,
        graft.operators.Multimodal.asMedia(
          graft.sources.Tables.sharded(spark, dir, "documents")))
      .filter(col("phash") =!= 0L)
      .select(col("modality"), col("doc_id"), col("phash").as("fp"))
      .transform(graft.operators.Checkpointing.cut)
    val aud = graft.operators.Multimodal.audioEnergyHashes(spark,
        graft.operators.Multimodal.asMedia(
          graft.sources.Tables.sharded(spark, dir, "documents")))
      .filter(col("ehash") =!= 0L)
      .select(lit("audio").as("modality"), col("doc_id"), col("ehash").as("fp"))
    val all = feats.filter(col("modality") =!= "audio").unionByName(aud)
    val blocks = array((0 until 5).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("fp"), b * 13)
          .bitwiseAND(lit(if (b == 4) 4095L else 8191L)).as("bval"))
    }: _*)
    val sizes = all.select(col("modality"), col("doc_id"), explode(blocks).as("bk"))
      .groupBy("modality", "bk").agg(count(lit(1)).as("n"))
    sizes.groupBy("modality")
      .agg(sum("n").as("entries"), count(lit(1)).as("buckets"),
        max("n").as("max_bucket"),
        expr("approx_percentile(n, 0.99)").as("p99"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_mass"))
      .orderBy("modality")
      .show(false)
    spark.stop()
  }
}
