package graft.tools

/** Times the OPT-IN full-corpus `dedup_lsh_audit` form at a given lake —
  * the r7 measurement for the gram-keyed two-stage verify (done = the 60×
  * point ≤ 2× the 30× point; the r6 array-verify measured 15.3 s → 50.5 s
  * on that doubling, GC-bound). Fresh session per run, so the shared
  * signature/pair/gram artifacts are charged to the number — consistent
  * across points, which is what the ratio needs.
  * `sbt "Test/runMain graft.tools.AuditScaleProbe <sfDir>"` */
object AuditScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val t0 = System.nanoTime()
    val row = graft.SparkEntry.queries("dedup_lsh_audit")(spark, dir)
      .collect().head
    println(f"[auditscale] full-form audit ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"row=$row  ($dir)")
    spark.stop()
  }
}
