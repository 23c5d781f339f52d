package graft.tools

/** Throwaway single-query timer for plan debugging:
  * `sbt "Test/runMain graft.tools.TimeOne <query> <sfDir> [reps]"`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/repo/target/sfscale"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.local(32)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
