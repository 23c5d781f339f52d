package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-volume probe for the full-exact audit join (t = 1/2 Jaccard)
  * at a scaled corpus: prints per-scale prefix sizes and the bucket-join
  * candidate volume Σ df(prefix gram)·(df−1)/2, which bounds the pair
  * work the exact join must shuffle + verify.
  * `sbt "Test/runMain graft.tools.AuditProbe <sfDir> [tNum tDen]"` */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (tNum, tDen) =
      if (args.length > 2) (args(1).toInt, args(2).toInt) else (1, 2)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val ranked = graft.operators.Dedup.rankedByRarity(
      graft.sources.Tables.sharded(spark, dir, "documents")
        .select(col("doc_id"), graft.plans.NgramHashes.hashes(spark, col("text"), 3).as("grams")))
    val prefix = ranked.select(col("doc_id"), col("n"),
      explode(slice(col("grams"), lit(1),
        col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + lit(1))).as("gram"))
    val nPrefix = prefix.count()
    val cand = prefix.groupBy("gram").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2).as("cand")).head().getDouble(0)
    println(f"[auditprobe] $dir prefixRows=$nPrefix candUpperBound=${cand}%.0f")
    spark.stop()
  }
}
