package graft.tools

/** Tier-level timing for the scaling audit: every gated query whose name
  * matches one of the prefixes, timed in ONE session (so session-memoized
  * builds are attributed to their first toucher, exactly like Bench), with
  * `reps` passes — pass 1 is the cold corpus read + memo build, later
  * passes are steady-state.
  *
  * `sbt "Test/runMain graft.tools.TimeMany <sfDir> <reps> <prefix,prefix,...>"`
  * prints one line per (query, rep) plus a per-query min summary.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val prefixes = (if (args.length > 2) args(2) else "dedup_,knn_,emb_").split(",").toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (rep <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timemany] rep=$rep $name%-28s ${s}%7.2f s rows=$n")
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), s)
    }
    println("[timemany] === per-query best ===")
    best.foreach { case (n, s) => println(f"[timemany] best $n%-28s ${s}%7.2f s") }
    println(f"[timemany] total-best ${best.values.sum}%.2f s over ${best.size} queries")
    spark.stop()
  }
}
