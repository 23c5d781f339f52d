package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev profiling for the streaming gates: run one gated query and print
  * every micro-batch's durationMs breakdown (addBatch / getBatch /
  * latestOffset / commitOffsets / walCommit / queryPlanning) plus state
  * store metrics — where the fixed per-batch cost actually goes.
  * usage: Test/runMain graft.tools.StreamProfile <query> [sfDir] [reps]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[sprof] query started ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[sprof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(o =>
            s"(rows=${o.numRowsTotal} updated=${o.numRowsUpdated} " +
            s"commitMs=${o.commitTimeMs} mem=${o.memoryUsedBytes})").mkString(",")}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[sprof] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
