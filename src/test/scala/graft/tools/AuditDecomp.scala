package graft.tools
import org.apache.spark.sql.functions._
/** Throwaway decomposition probe for the full exact-audit join. */
object AuditDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val ranked = time("ranked build+cut")(graft.operators.Dedup.rankedByRarity(
      graft.sources.Tables.sharded(spark, dir, "documents")
        .select(col("doc_id"), graft.plans.NgramHashes.hashes(spark, col("text"), 3).as("grams"))))
    val (tNum, tDen) = (1, 2)
    val prefix = ranked.select(col("doc_id"), col("n"),
      posexplode(slice(col("grams"), lit(1),
        col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + lit(1)))
        .as(Seq("pos", "gram")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * tNum <= col("b.n") * tDen && col("b.n") * tNum <= col("a.n") * tDen &&
          (least(col("a.pos"), col("b.pos")) +
            least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) * (tNum + tDen)
            >= (col("a.n") + col("b.n")) * tNum)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val candC = time("cand distinct")(cand.transform(graft.operators.Checkpointing.cut))
    println("  cand=" + candC.count())
    val verified = time("verify join")(
      candC.join(ranked.select(col("doc_id").as("doc_a"),
          col("gsorted").as("g_a"), col("n").as("n_a")).hint("shuffle_hash"), "doc_a")
        .join(ranked.select(col("doc_id").as("doc_b"),
          col("gsorted").as("g_b"), col("n").as("n_b")).hint("shuffle_hash"), "doc_b")
        .withColumn("n_inter", graft.plans.SortedIntersectCount.count(spark, col("g_a"), col("g_b")))
        .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
        .filter(col("n_inter") * tDen >= col("n_union") * tNum)
        .count())
    println("  pairs=" + verified)
    spark.stop()
  }
}
