package graft.tools
object AudProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import org.apache.spark.sql.functions._
    for (dir <- args) {
      val ov = graft.SparkEntry.queries("mm_bucket_overflow")(spark, dir)
      println(s"[audprobe] $dir bucket_overflow:")
      ov.collect().foreach(r => println(s"[audprobe]   $r"))
      // audio near-dup degree distribution: pairs per doc
      val p = graft.SparkEntry.queries("mm_audio_near_dup")(spark, dir)
      val deg = p.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy("d").agg(count(lit(1)).as("deg"))
        .agg(count(lit(1)).as("n_docs_in_pairs"), max("deg").as("max_deg"),
          avg("deg").as("mean_deg"))
      deg.collect().foreach(r => println(s"[audprobe]   audio degrees: $r"))
    }
    spark.stop()
  }
}
