package graft.tools

/** Print the formatted physical plan of one gated query:
  * `sbt "Test/runMain graft.tools.ExplainOne <name> [sfDir]"` */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(8)
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
