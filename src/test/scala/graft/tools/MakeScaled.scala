package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-audit corpus builder: replicates the sf0.1 fact tables K times
  * into a scratch dir (≈ sf1) so Bench can produce an empirical point one
  * order of magnitude above the driver gate's largest SF.
  *
  * Replicas shift every id family by k·(max+1) and REWRITE content so that
  * duplicate/collision RATES stay at the original corpus's density: naive
  * x10 copies would put 10 identical texts in every signature bucket (and a
  * suffix-only tweak still leaves every replica a NEAR-dup of its original,
  * inflating the true pair workload ~45x). Documents instead pass through a
  * per-replica `translate` rotation of the 10 most frequent letters —
  * structurally identical (same lengths, whitespace, token boundaries,
  * quality-score shape) but gram-disjoint across replicas; embeddings are
  * rotated by k positions — same norm and dimension stats, uncorrelated
  * directions. Within-replica dup structure is preserved exactly.
  * Dimensions (region/nation/customer/supplier/part) stay unscaled, which
  * also keeps bounded-domain operators (bitmap_distinct over p_partkey)
  * meaningful.
  *
  * Run: `sbt "Test/runMain graft.tools.MakeScaled [K] [srcDir] [outDir]"`.
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 10
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else "/root/repo/target/sfscale"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)

    def read(t: String): DataFrame = {
      // events carries INT64 TIMESTAMP(NANOS) — same flag Tables sets
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$src/$t.parquet")
    }
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dims: copied, not scaled
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    def maxPlus1(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L

    /** K replicas of `df` with the listed id columns shifted by k·stride and
      * optional per-replica column overrides. */
    def replicate(df: DataFrame, idCols: Seq[String],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val strides = idCols.map(c => c -> maxPlus1(df, c)).toMap
      (0 until k).map { rep =>
        val shifted = idCols.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c) + lit(rep * strides(c))) }
        mutate(shifted, rep)
      }.reduce(_ union _)
    }

    val orders = read("orders")
    val okStride = maxPlus1(orders, "o_orderkey")
    write((0 until k).map(rep =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(rep * okStride)))
      .reduce(_ union _), "orders")
    val li = read("lineitem")
    write((0 until k).map(rep =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(rep * okStride)))
      .reduce(_ union _), "lineitem")

    write(replicate(read("events"), Seq("event_id", "user_id")), "events")

    // two-level letter rotation: rep%10 rotates the 10 highest-frequency
    // letters, rep/10 rotates the next 10 — a distinct combined mapping for
    // every rep < 100 (a single-level rotation aliases rep and rep+10 into
    // identical texts, seeding cross-replica exact dups at K>10). Every
    // word changes, no gram survives across replicas, text structure is
    // untouched. Texts the rotation leaves byte-identical (short/numeric/
    // empty — containing none of the 20 letters) get a replica-salted token
    // appended instead, so they can't seed size-K cross-replica exact-dup
    // clusters that the content-disjoint design excludes from the slope.
    val alpha1 = "etaoinshrd"
    val alpha2 = "lucmfwypvb"
    def rot(a: String, r: Int) = a.drop(r) + a.take(r)
    // per-replica CASE toggle on top of the rotation: the dedup/text gram
    // pipelines lowercase, so case carries no gram signal — but the
    // multimodal tier builds pixel/sample bytes from the RAW text, and a
    // letter rotation is exactly the small perturbation perceptual hashes
    // are designed to absorb (measured: 30 replicas collapsed into
    // Hamming≤4 image families, making mm_near_dup output quadratic in K —
    // pair density, not corpus size). Uppercasing a replica-dependent
    // 9-letter subset shifts those bytes by −32, far past any aHash cell
    // threshold, so media content is replica-disjoint while gram content
    // and text structure are untouched.
    val lets = "abcdefghijklmnopqrstuvwxyz"
    def caseSel(rep: Int): String =
      lets.filter(c => (lets.indexOf(c) * 7 + rep * 11) % 26 < 9)
    write(replicate(read("documents"), Seq("doc_id"),
      (d, rep) => if (rep == 0) d
        else {
          val rotated = translate(col("text"),
            alpha1 + alpha2, rot(alpha1, rep % 10) + rot(alpha2, rep / 10))
          val salted =
            when(rotated === col("text"), concat(col("text"), lit(s" q${rep}z")))
              .otherwise(rotated)
          val sel = caseSel(rep)
          d.withColumn("text", translate(salted, sel, sel.toUpperCase))
        }),
      "documents")

    write(replicate(read("embeddings"), Seq("vec_id"),
      (d, rep) => if (rep == 0) d
        else d.withColumn("embedding", expr(
          s"concat(slice(embedding, ${rep + 1}, size(embedding) - $rep), slice(embedding, 1, $rep))"))),
      "embeddings")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"[scaled] $t rows=" + spark.read.parquet(s"$out/$t.parquet").count())
    }
    spark.stop()
  }
}
