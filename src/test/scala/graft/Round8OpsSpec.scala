package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Crafted-input specs for the round-8 additions, covering the laws the
  * oracle gate can't isolate: the replayable HLL's register math against a
  * from-scratch Scala reference, the histogram quantile sketch and the
  * weighted percentile against hand-computable distributions, the kNN
  * graph against a brute-force in-cell reference, and the BPE encoder's
  * concatenation invariant.
  */
class Round8OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- replayable HLL (q_approx_distinct) ----------------------------

  /** From-scratch reference of the query's HLL: md5-48 hash, top-9-bit
    * bucket, rho over the low 39 bits, integer S_scaled, raw/linear-count
    * branches — independent of the Spark plan. */
  private def refHll(keys: Seq[Long]): (Long, Boolean, Long, Long) = {
    val m = 512
    val regs = new Array[Int](m)
    keys.distinct.foreach { k =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val j = (h >>> 39).toInt
      val w = h & 549755813887L
      val rho = if (w == 0L) 40 else 40 - java.lang.Long.toBinaryString(w).length
      if (rho > regs(j)) regs(j) = rho
    }
    val present = regs.count(_ > 0)
    val vEmpty = m - present
    val sScaled = regs.filter(_ > 0).map(mj => 1L << (50 - mj)).sum +
      vEmpty.toLong * 1125899906842624L
    val raw = (0.7213 / (1.0 + 1.079 / 512.0)) * 262144.0 *
      1125899906842624.0 / sScaled.toDouble
    val small = raw <= 1280.0 && vEmpty > 0
    val est = if (small) 512.0 * math.log(512.0 / vEmpty) else raw
    (math.floor(est).toLong, small, vEmpty.toLong,
      regs.filter(_ > 0).map(_.toLong).sum)
  }

  private def hllRow(keys: Seq[Long]): (Long, Boolean, Long, Long) = {
    val df = keys.map(k => ("g", k)).toDF("l_returnflag", "l_partkey")
    // re-derive the query's sketch arithmetic over a crafted frame by
    // reusing the registered plan pieces
    val h = df.select(col("l_returnflag"),
      conv(substring(md5(col("l_partkey").cast("string")), 1, 12), 16, 10)
        .cast("long").as("h"))
    val regs = h.select(col("l_returnflag"),
        shiftright(col("h"), 39).as("j"),
        col("h").bitwiseAND(lit(549755813887L)).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(40)).otherwise(lit(40) - length(bin(col("w")))))
      .groupBy("l_returnflag", "j").agg(max("rho").as("m_j"))
    val r = regs.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_regs"),
        expr("sum(shiftleft(cast(1 as bigint), cast(50 - m_j as int)))").as("sp"),
        sum("m_j").as("ck"))
      .select((lit(512L) - col("n_regs")).as("v"),
        (col("sp") + (lit(512L) - col("n_regs")) * lit(1125899906842624L)).as("ss"),
        col("ck"))
      .withColumn("raw", (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0))) *
        lit(262144.0) * lit(1125899906842624.0) / col("ss").cast("double"))
      .withColumn("small", col("raw") <= lit(1280.0) && col("v") > 0)
      .withColumn("est", when(col("small"),
        lit(512.0) * log(lit(512.0) / col("v").cast("double"))).otherwise(col("raw")))
      .select(floor(col("est")).cast("long"), col("small"), col("v"), col("ck"))
      .as[(Long, Boolean, Long, Long)].head()
    r
  }

  test("replayable HLL matches the from-scratch reference on both branches") {
    // small-range branch (n << 2.5m) and raw branch (n >> 2.5m)
    for (n <- Seq(100, 800, 20000)) {
      val keys = (1L to n.toLong).map(_ * 7919L)
      val got = hllRow(keys)
      val want = refHll(keys)
      assert(got == want, s"n=$n: spark=$got ref=$want")
      // and the estimate is actually an estimate: within 3 rsd of truth
      assert(math.abs(got._1 - n).toDouble / n < 3 * 0.046,
        s"n=$n est=${got._1}")
    }
  }

  test("hll_distinct aggregate: matches the reference, partition-order-free") {
    graft.plans.NativeFunctions.register(spark)
    def agg(keys: Seq[Long], parts: Int): (Long, Boolean, Long, Long) =
      keys.toDF("k").repartition(parts)
        .select(conv(substring(md5(col("k").cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
        .agg(call_function("hll_distinct", col("h")).as("sk"))
        .select(col("sk.hll_parts"), col("sk.hll_small_range"),
          col("sk.hll_empty_regs"), col("sk.reg_checksum"))
        .as[(Long, Boolean, Long, Long)].head()
    for (n <- Seq(100, 20000)) {
      val keys = (1L to n.toLong).map(_ * 7919L)
      val want = refHll(keys)
      // same sketch under 1, 7, and 32 partitions — max-merge is
      // commutative/associative/idempotent
      for (p <- Seq(1, 7, 32))
        assert(agg(keys, p) == want, s"n=$n parts=$p")
      // duplicates are free: tripling every row changes nothing
      assert(agg(keys ++ keys ++ keys, 16) == want, s"n=$n with dups")
    }
  }

  test("HLL branches: small-range at tiny cardinality, raw at large") {
    assert(hllRow((1L to 50L).toSeq)._2, "n=50 must take linear counting")
    assert(!hllRow((1L to 20000L).map(_ * 31L))._2, "n=20000 must take raw")
  }

  // ---- weighted percentile -------------------------------------------

  test("weighted percentile: hand-computed crossing on a crafted distribution") {
    // prices 10.00/20.00/30.00 with quantity weights 1/1/8: half the
    // volume sits in the 30.00 mass → weighted p50 = p90 = 30.00, while
    // the row-median is 20.00 — exactly the statistic's point
    val rows = Seq(
      ("A", 10.00, 1.0), ("A", 20.00, 1.0), ("A", 30.00, 8.0))
    val df = rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val hist = df.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        round(col("l_quantity") * 100).cast("long").as("qc"))
      .groupBy("l_returnflag", "pc").agg(sum("qc").as("w"))
    val wC = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("pc")
    val cum = hist.withColumn("cum", sum("w").over(wC))
    val tot = hist.groupBy("l_returnflag").agg(sum("w").as("tot"))
    val p50 = cum.join(tot, "l_returnflag")
      .groupBy("l_returnflag")
      .agg(min(when(col("cum") * 2 >= col("tot"), col("pc"))).as("w50"))
      .select(col("w50")).as[Long].head()
    assert(p50 == 3000L, s"weighted median must be 30.00, got $p50")
  }

  test("weighted percentile degenerates to the left-continuous row quantile at unit weights") {
    // with every weight = 1 the crossing rule (k·cum ≥ q·k·n, smallest
    // price) must pick exactly the ⌈q·n⌉-th order statistic — check the
    // full crossing machinery against a directly computed reference on a
    // crafted multiset with duplicates and an even count
    val prices = Seq(5.00, 5.00, 7.25, 9.10, 9.10, 9.10, 12.00, 40.00)
    val df = prices.map(p => ("A", p, 1.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val hist = df.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        round(col("l_quantity") * 100).cast("long").as("qc"))
      .groupBy("l_returnflag", "pc").agg(sum("qc").as("w"))
    val wC = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("pc")
    val cum = hist.withColumn("cum", sum("w").over(wC))
    val tot = hist.groupBy("l_returnflag").agg(sum("w").as("tot"))
    def pick(num: Int, den: Int) =
      min(when(col("cum") * den >= col("tot") * num, col("pc")))
    val (w50, w90) = cum.join(tot, "l_returnflag")
      .groupBy("l_returnflag")
      .agg(pick(1, 2).as("w50"), pick(9, 10).as("w90"))
      .select(col("w50"), col("w90")).as[(Long, Long)].head()
    def orderStat(q: Double): Long = {
      val sorted = prices.sorted.map(p => math.round(p * 100))
      sorted((math.ceil(q * sorted.size) - 1).toInt.max(0))
    }
    assert(w50 == orderStat(0.5), s"unit-weight p50: $w50 vs ${orderStat(0.5)}")
    assert(w90 == orderStat(0.9), s"unit-weight p90: $w90 vs ${orderStat(0.9)}")
    // n = 8, q = 0.5 ⇒ the 4th order statistic = 9.10 (not the 7.25 a
    // right-continuous or interpolated rule would blend with)
    assert(w50 == 910L)
  }

  // ---- histogram quantile sketch (q_approx_percentiles) ---------------

  test("histogram sketch: within one bucket width of exact at sf") {
    val rows = SparkEntry.queries("q_approx_percentiles")(spark, sf)
      .select("hist_p50", "p50", "hist_p95", "p95")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val bucketDollars = 65536.0 / 100.0
    rows.foreach { case (h50, p50, h95, p95) =>
      assert(math.abs(h50 - p50) <= bucketDollars, s"$h50 vs $p50")
      assert(math.abs(h95 - p95) <= bucketDollars, s"$h95 vs $p95")
    }
  }

  // ---- kNN graph ------------------------------------------------------

  test("emb_knn_graph equals brute-force top-3 within each IVF cell") {
    val graph = SparkEntry.queries("emb_knn_graph")(spark, sf)
      .select("vec_id", "rk", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
    assert(graph.nonEmpty)
    // reference: per-cell brute force over the same memoized index
    val idx = queries.VectorQueries.ivfIndexForSpec(spark, sf)
      .select("cluster", "vec_id", "embedding")
      .as[(Int, Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = idx.toSeq.groupBy(_._1)
    val want = byCell.values.toSeq.flatMap { cell =>
      cell.flatMap { case (_, v, e) =>
        cell.filter(_._2 != v)
          .map { case (_, n, ne) =>
            (v, n, BigDecimal(cos(e, ne)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          .sortBy { case (_, n, c) => (-c, n) }
          .take(3).zipWithIndex
          .map { case ((_, n, _), i) => (v, (i + 1).toLong, n) }
      }
    }.toSet
    val got = graph.map { case (v, rk, n, _) => (v, rk, n) }.toSet
    // compare (vec, rk, neighbor) triples; cosine rounding differences on
    // exact ties are excluded by the deterministic (cos desc, id) rule
    assert(got == want, s"diff: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
  }

  // ---- thumbnail resize ----------------------------------------------

  test("thumbnailHalf samples src(2x,2y) for odd and even extents") {
    import graft.functions.MediaCodecs
    // 5×3 image with pixel value = 10*y + x — easy to read off
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => (10 * (i / w) + (i % w)).toByte)
    val (tp, w2, h2) = MediaCodecs.thumbnailHalf(px, w, h)
    assert((w2, h2) == (3, 2))
    assert(tp.toSeq == Seq(0, 2, 4, 20, 22, 24).map(_.toByte),
      "thumb must be the even-coordinate grid")
    // even extents: 4×2 → 2×1
    val (tp2, w4, h4) = MediaCodecs.thumbnailHalf(
      Array.tabulate(8)(_.toByte), 4, 2)
    assert((w4, h4) == (2, 1) && tp2.toSeq == Seq(0.toByte, 2.toByte))
    // 1×1 degenerates to itself
    val (tp3, a, b) = MediaCodecs.thumbnailHalf(Array(7.toByte), 1, 1)
    assert((a, b) == (1, 1) && tp3.toSeq == Seq(7.toByte))
  }

  // ---- ordered chunk writer ------------------------------------------

  test("writeOrderedChunks: strictly increasing stamped mtimes, lossless rows") {
    val df = (1L to 100L).map(i => (i, i * 1000L)).toDF("id", "ts_us")
    val feed = graft.streaming.StreamGate.writeOrderedChunks(
      df, "ts_us", chunks = 4, prefix = "graft-chunk-spec")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(feed))
      .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    assert(files.map(_.getFileName.toString) ==
      (0 until 4).map(i => f"chunk-$i%04d.parquet"))
    val mtimes = files.map(java.nio.file.Files.getLastModifiedTime(_).toMillis)
    assert(mtimes == mtimes.sorted && mtimes.distinct.size == 4,
      s"mtimes must be strictly increasing stamps, got $mtimes")
    // chunk i must hold strictly earlier timestamps than chunk i+1 (the
    // arrival-order contract the stale-drop gates rely on), and the union
    // must be lossless
    val ranges = files.map { p =>
      val c = spark.read.parquet(p.toString).select("ts_us").as[Long].collect()
      assert(c.nonEmpty, s"empty chunk ${p.getFileName}")
      (c.min, c.max)
    }
    ranges.sliding(2).foreach { case Seq((_, maxA), (minB, _)) =>
      assert(maxA < minB, s"chunk ranges must not interleave: $ranges")
    }
    val back = spark.read.parquet(feed)
    assert(back.count() == 100)
    assert(back.select("id").as[Long].collect().toSet == (1L to 100L).toSet)
    graft.operators.Checkpointing.deleteRecursively(
      java.nio.file.Paths.get(feed).getParent.toString)
  }

  // ---- BPE encoder ----------------------------------------------------

  test("text_bpe_encode: pieces concatenate to the term; merges actually applied") {
    val rows = SparkEntry.queries("text_bpe_encode")(spark, sf)
      .select("term", "n_pieces", "pieces").as[(String, Long, String)].collect()
    assert(rows.length > 0 && rows.length <= 50)
    rows.foreach { case (term, n, pieces) =>
      val ps = pieces.split(" ", -1).filter(_.nonEmpty)
      assert(ps.mkString("") == term, s"pieces must respell '$term': $pieces")
      assert(ps.length == n, s"n_pieces mismatch for '$term'")
      assert(n <= term.length, "merges can only shrink the piece count")
    }
    // at least one head term must actually be compressed below chars
    assert(rows.exists { case (t, n, _) => n < t.length },
      "6 merges must compress at least one top-50 term")
  }
}
