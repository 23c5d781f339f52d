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
    val pairs = graft.operators.Dedup.jaccardPairsFromRanked(ranked, 1, 2)
    time("exact pairs (suffix-filtered cand + verify)")(println("  pairs=" + pairs.count()))
    spark.stop()
  }
}
