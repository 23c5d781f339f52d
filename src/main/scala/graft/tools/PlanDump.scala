package graft.tools

/** Dump `.explain("formatted")` for the named queries into files — the
  * before/after plan evidence the optimization rounds commit under
  * plans/r{N}/. Runs the SAME session shape as Bench (GraftSession.local,
  * SPARK_GRAFT_CPUS) so Exchange counts / join strategies / pushdowns match
  * what the bench actually executes, not a differently-sized toy session.
  *
  * usage: graft.tools.PlanDump <outDir> <suffix> <query,query,...> [sfDir]
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
