package graft.tools

import org.apache.spark.sql.functions._

/** Skew-stress lake builder (r12 — VERDICT item 9): a copy of an sf lake
  * whose `events` table is DELIBERATELY skewed — one hot user absorbs
  * `hotPct`% of all rows (a deterministic event_id residue slice is
  * reassigned to user 0), everything else untouched. This is the
  * pathological-key regime the salted/skew joins and user-keyed streaming
  * state exist for: at 1% the hot key carries ~15× the mean user's rows
  * at sf0.1, at 10% ~150×. The driver-gate oracles recompute ground truth
  * over the SAME skewed parquet, so running Verify + check.py against
  * this lake re-proves CORRECTNESS under skew, and TimeMany against it
  * measures what the skew costs.
  *
  * Run: `sbt "Test/runMain graft.tools.MakeSkewed [hotPct] [srcDir] [outDir]"`.
  */
object MakeSkewed {
  def main(args: Array[String]): Unit = {
    val hotPct = if (args.length > 0) args(0).toInt else 1
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2)
      else s"/root/repo/target/sfskew$hotPct"
    require(hotPct >= 1 && hotPct <= 100, s"hotPct out of range: $hotPct")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach(t => write(read(t), t))
    // the skew: event_id % (100/hotPct) == 0 → user 0 (deterministic, so
    // any probe can replay the slice); ids/timestamps/payloads untouched
    val stride = 100 / hotPct
    write(read("events").withColumn("user_id",
      when(pmod(col("event_id"), lit(stride.toLong)) === 0, lit(0L))
        .otherwise(col("user_id"))), "events")
    val hot = spark.read.parquet(s"$out/events.parquet")
      .filter(col("user_id") === 0L).count()
    val tot = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[make-skewed] $out: hot user 0 carries $hot of $tot rows " +
      f"(${hot * 100.0 / tot}%.2f%%)")
    spark.stop()
  }
}
