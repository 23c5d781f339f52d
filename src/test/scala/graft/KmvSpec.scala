package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{KmvBuf, NativeFunctions}

/** KMV (bottom-k-distinct) sketch: buffer laws the oracle gate can't
  * isolate — dedupe, bound, merge-order freedom — plus the estimator's
  * error envelope and partition-order invariance on the real lake.
  */
class KmvSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("KmvBuf: dedupes, keeps the k smallest, sorted ascending") {
    val b = KmvBuf.empty(4)
    Seq(9L, 3L, 9L, 7L, 5L, 1L, 8L, 3L).foreach(b.offer)
    assert(b.sorted.toSeq == Seq(1L, 3L, 5L, 7L)) // 9,8 evicted; dups absorbed
  }

  test("KmvBuf: under-full buffer IS the distinct set") {
    val b = KmvBuf.empty(10)
    Seq(5L, 2L, 5L, 2L).foreach(b.offer)
    assert(b.sorted.toSeq == Seq(2L, 5L))
  }

  test("KmvBuf: merge is order-free") {
    def fill(vs: Seq[Long]) = { val b = KmvBuf.empty(3); vs.foreach(b.offer); b }
    val ab = fill(Seq(4L, 1L, 6L)); ab.absorb(fill(Seq(2L, 6L, 9L)))
    val ba = fill(Seq(2L, 6L, 9L)); ba.absorb(fill(Seq(4L, 1L, 6L)))
    assert(ab.sorted.toSeq == ba.sorted.toSeq)
    assert(ab.sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("KmvBuf: negative key (not a hash) fails loudly") {
    intercept[IllegalArgumentException] { KmvBuf.empty(2).offer(-1L) }
  }

  test("bottomk_distinct aggregate: partition layout cannot change the sketch") {
    NativeFunctions.register(spark)
    val df = (1L to 500L).map(i => i * 2654435761L % 1000003L).toDF("h")
    def mins(parts: Int) =
      df.repartition(parts).agg(call_function("bottomk_distinct", col("h"), lit(16)))
        .head().getSeq[Long](0).toSeq
    assert(mins(1) == mins(7))
  }

  test("q_kmv_distinct: estimate lands inside the KMV error envelope") {
    // KMV standard error ~ 1/sqrt(k-2) ≈ 12.7% at k=64; assert 4 sigma
    val rows = SparkEntry.queries("q_kmv_distinct")(spark, sf)
      .select("kmv_parts", "exact_parts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(0); val exact = r.getLong(1).toDouble
      assert(math.abs(est - exact) / exact <= 0.51,
        s"KMV estimate $est vs exact $exact outside 4-sigma envelope")
    }
  }

  test("q_sampled_percentiles: sample stats track the exact full-corpus stats") {
    val sampled = SparkEntry.queries("q_sampled_percentiles")(spark, sf)
      .select("l_returnflag", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("q_percentiles")(spark, sf)
      .select("l_returnflag", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(sampled.keySet == exact.keySet)
    exact.foreach { case (flag, (p50, p95)) =>
      val (s50, s95) = sampled(flag)
      assert(math.abs(s50 - p50) / p50 <= 0.10, s"$flag p50 sample drift: $s50 vs $p50")
      assert(math.abs(s95 - p95) / p95 <= 0.10, s"$flag p95 sample drift: $s95 vs $p95")
    }
  }

  test("q_sketch_setops: estimates inside the envelope, exact identities hold") {
    val rows = SparkEntry.queries("q_sketch_setops")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Double]("kmv_union")
      val i = r.getAs[Double]("kmv_inter")
      val j = r.getAs[Double]("kmv_jaccard")
      val eu = r.getAs[Long]("exact_union").toDouble
      val eo = r.getAs[Long]("exact_overlap").toDouble
      // sketch-level sanity: intersection ≤ union, Jaccard = inter/union
      assert(i <= u + 1e-9)
      assert(j >= 0.0 && j <= 1.0)
      // union estimate inside the 4-sigma KMV envelope (k = 64)
      assert(math.abs(u - eu) / eu <= 0.51, s"union est $u vs exact $eu")
      // intersection estimate inherits both sketches' error — wider bound,
      // and absolute-floored: at tiny SF a handful of merged hashes decide
      // the overlap fraction
      assert(math.abs(i - eo) <= math.max(0.75 * eo, 0.35 * eu),
        s"intersection est $i vs exact $eo (union $eu)")
    }
  }

  test("q_sketch_setops: composing stored sketches equals sketching the union") {
    // the mergeability law behind the pre-aggregated sketch table: the
    // k smallest of (Ka ∪ Kb) equal the k smallest of hash(A ∪ B) —
    // guaranteed when |merged| ≥ k covers the true bottom-k, which holds
    // because each side retains ITS bottom-k
    NativeFunctions.register(spark)
    val a = (1L to 400L).map(i => i * 2654435761L % 1000003L)
    val b = (200L to 600L).map(i => i * 2654435761L % 1000003L)
    val k = 16
    def sketch(vs: Seq[Long]): Seq[Long] =
      vs.toDF("h").agg(call_function("bottomk_distinct", col("h"), lit(k)))
        .head().getSeq[Long](0).toSeq
    val merged = (sketch(a) ++ sketch(b)).distinct.sorted.take(k)
    assert(merged == sketch(a ++ b))
  }
}
