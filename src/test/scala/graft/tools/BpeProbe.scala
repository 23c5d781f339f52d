package graft.tools

/** Times TokenizerFit at a scaled lake: vocab collapse + 3 merge
  * iterations — the claim under test is that training cost rides the
  * VOCABULARY (types), not the corpus (tokens).
  * `sbt "Test/runMain graft.tools.BpeProbe <sfDir>"` */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(32)
    val t0 = System.nanoTime()
    val v = graft.operators.TokenizerFit.vocab(
      graft.sources.Tables.sharded(spark, dir, "documents"), "text")
    val nTypes = v.count()
    val t1 = System.nanoTime()
    val (merges, _) = graft.operators.TokenizerFit.fit(v, merges = 3)
    val t2 = System.nanoTime()
    println(f"[bpeprobe] $dir types=$nTypes vocab=${(t1 - t0) / 1e9}%.1f s " +
      f"fit3=${(t2 - t1) / 1e9}%.1f s merges=$merges")
    spark.stop()
  }
}
