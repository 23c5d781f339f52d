package graft.tools

/** Times the multimodal pair-build chain (the r6 superlinear hot spot) at a
  * given lake — the measurement behind the r7 bounded-bucket cap's done
  * criterion (30× point ≤ 2× the 10× point for the pair builds).
  * `sbt "Test/runMain graft.tools.MmScaleProbe <sfDir>"` */
object MmScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val qs = Seq("mm_near_dup", "mm_dedup_clusters", "mm_keep_list",
      "mm_video_near_dup", "mm_video_clusters", "mm_video_keep_list",
      "mm_audio_near_dup", "mm_audio_clusters", "mm_bucket_overflow")
    var total = 0.0
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      println(f"[mmscale] $q%-22s rows=$n%-9d ${dt}%6.1f s")
    }
    println(f"[mmscale] TOTAL ${total}%.1f s  ($dir)")
    spark.stop()
  }
}
