package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("hllUnion default posture: ONE corpus scan; audit is the explicit opt-in") {
    // the r8 VERDICT item 5 guard: the register-table build is the one
    // corpus pass (it happens inside the lineage cut), and the DEFAULT
    // returned plan is pure register algebra — no file relation at all.
    // audit=true is the gate-SF opt-in whose plan re-reads the lake once.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def corpusScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case p if p.getClass.getSimpleName.contains("Relation")
          && !p.getClass.getSimpleName.contains("LocalRelation") => p
      }.size
    val noAudit = graft.queries.RelationalQueries
      .hllUnion(li, "l_returnflag", "l_partkey")
    assert(corpusScans(noAudit) == 0,
      "default hllUnion must consume only the cut register table")
    assert(noAudit.columns.toSeq == Seq("seg_a", "seg_b", "hll_union"))
    val audited = graft.queries.RelationalQueries
      .hllUnion(li, "l_returnflag", "l_partkey", audit = true)
    assert(corpusScans(audited) == 1,
      "audit=true re-reads the corpus exactly once for the exact union")
    // and the estimate column is identical in both postures
    val a = noAudit.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = audited.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("asofJoin: latest at-or-before per key; equal ts matches (at-OR-before)") {
    val left = Seq((10L, 1L, 100L, 1.0), (11L, 1L, 250L, 2.0), (12L, 2L, 50L, 3.0))
      .toDF("event_id", "k", "ts", "v")
    val right = Seq((1L, 1L, 100L, 7.0), (2L, 1L, 200L, 8.0), (3L, 2L, 60L, 9.0))
      .toDF("event_id", "k", "ts", "rv")
    val got = Relational.asofJoin(left, right, "k", "ts", "ts", "event_id",
        Seq("ts" -> "r_ts", "rv" -> "r_v"))
      .orderBy("event_id")
      .select("event_id", "r_ts", "r_v").as[(Long, Option[Long], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (10L, Some(100L), Some(7.0)),  // exact tie → matched (at-or-before)
      (11L, Some(200L), Some(8.0)),  // latest of two earlier rows
      (12L, None, None)))            // right row is later → no match
  }

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val df = Seq((1L, 0L, 1L), (2L, 100L, 1L), (3L, 200L, 1L), (4L, 301L, 1L))
      .toDF("id", "ts", "k")
    val got = Relational.sessionize(df, "k", "ts", "id", 100L)
      .orderBy("id").select("session_id").as[Long].collect().toSeq
    // gaps: -,100,100,101 → exactly-gap stays, gap+1 splits
    assert(got == Seq(1L, 1L, 1L, 2L))
  }

  test("topKPerGroup returns exactly k with deterministic tie-break") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("b", 4L, 1.0))
      .toDF("g", "id", "score")
    val got = Relational.topKPerGroup(df, Seq("g"), Seq($"score".desc, $"id"), 2)
      .orderBy("g", "rk").select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 4L))
  }

  test("topKByScore (bounded-heap agg) matches the window form on random data with ties") {
    val rnd = new scala.util.Random(7)
    // 12 groups × ~200 rows, scores rounded to 1dp so ties are common and
    // the id tie-break actually decides rows
    val rows = (0 until 2500).map { i =>
      (i % 12, i.toLong, math.floor(rnd.nextDouble() * 10) / 10.0)
    }
    val df = rows.toDF("g", "id", "score").repartition(8) // force partial merges
    val viaWindow = Relational.topKPerGroup(df, Seq("g"), Seq($"score".desc, $"id"), 7)
      .select($"g", $"rk".cast("long").as("rk"), $"id", $"score")
      .orderBy("g", "rk").as[(Int, Long, Long, Double)].collect().toSeq
    val viaAgg = Relational.topKByScore(df, "g", "score", "id", 7)
      .select($"g", $"rk", $"id", $"score")
      .orderBy("g", "rk").as[(Int, Long, Long, Double)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("topKByScore: NaN ranks first (Double.compare order), null scores dropped") {
    val rows: Seq[(Int, Long, Option[Double])] =
      Seq((1, 1L, Some(0.5)), (1, 2L, Some(Double.NaN)), (1, 3L, None),
        (1, 4L, Some(0.9)), (1, 5L, Some(0.9))) ++
        // enough NaN/real churn to exercise eviction with NaN in the buffer
        (10L until 40L).map(i => (1, i, Some(if (i % 5 == 0) Double.NaN else i / 100.0)))
    val got = Relational.topKByScore(rows.toDF("g", "id", "score"), "g", "score", "id", 3)
      .orderBy("rk").select("id").as[Long].collect().toSeq
    // NaN sorts above every real score, ties among NaNs break by id asc
    assert(got == Seq(2L, 10L, 15L))
  }

  test("topKByScore shuffles partial heaps, not the scored input") {
    val df = (0 until 1000).map(i => (i % 4, i.toLong, i / 7.0)).toDF("g", "id", "score")
      .repartition(8)
    val plan = Relational.topKByScore(df, "g", "score", "id", 5)
      .queryExecution.executedPlan.toString
    // partial aggregation before the exchange is the whole point: the
    // HashAggregate pair (partial below, final above the shuffle) must
    // carry the topk buffer, not raw rows through a window sort
    assert(plan.contains("topk"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("q5 star join broadcasts every dimension") {
    val plan = queries.RelationalQueries.queries("q5_multijoin")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q_string_agg and q_mad keep their tiny-side joins broadcast") {
    // insurance that stats drift never silently flips these to sort-merge:
    // q_string_agg joins two dims (region × nation), q_mad joins the fact
    // table against a per-group median table of a handful of rows — a
    // sort-merge there would shuffle the whole fact side for nothing
    Seq("q_string_agg", "q_mad").foreach { name =>
      val plan = queries.RelationalQueries.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n${plan.take(3000)}")
      assert(!plan.contains("SortMergeJoin"), s"$name:\n${plan.take(3000)}")
    }
  }

  test("q1 scan prunes to the referenced columns only") {
    val plan = queries.RelationalQueries.queries("q1_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(3000))
    // projection pruning: untouched wide columns must not be read
    assert(!plan.contains("l_partkey"), plan.take(3000))
  }

  test("exact-sum correlation agrees with the built-in corr aggregate") {
    // q_corr_stats rebuilds corr from exact cents-scaled integer sums (for
    // cross-engine determinism); it must still be the same statistic the
    // float co-moment aggregate computes, up to the cents quantization.
    val ours = queries.RelationalQueries.queries("q_corr_stats")(spark, sf)
      .select("l_returnflag", "corr_qty_price")
      .as[(String, Double)].collect().toMap
    val ref = sources.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double)].collect().toMap
    assert(ours.keySet == ref.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-4, s"$k: exact-sum $v vs builtin ${ref(k)}")
    }
  }

  test("concurrency sweep: crafted intervals hit the known peak") {
    // [0,10] [5,15] overlap → 2; [15,20] touches [5,15] at 15 → closed
    // intervals overlap there too → 3 live at t=15? no — [0,10] is closed
    // by then: at t=15 the open set is {[5,15],[15,20]} = 2. Peak 2.
    // [30,30] is a zero-length interval: its +1 sorts before its −1.
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 15L, 20L), (4L, 30L, 30L))
      .toDF("id", "st", "en")
    val swept = Relational.concurrency(iv, "st", "en", Seq("id"))
    val atBoundary = swept.orderBy("ts", "delta")
      .select("ts", "delta", "cur").as[(Long, Int, Long)].collect().toSeq
    // peak over the whole sweep
    assert(swept.agg(max("cur")).head().getLong(0) == 2L)
    // the zero-length interval registers: its start boundary shows cur = 1
    assert(atBoundary.contains((30L, 1, 1L)))
    // sweep balances: final running value is zero
    val last = swept.orderBy($"ts".desc, $"delta", $"id".desc).select("cur")
      .head().getLong(0)
    assert(last == 0L)
  }

  test("concurrency sweep: partition count cannot change the result") {
    val iv = (1L to 200L).map(i => (i, i % 37, i % 37 + i % 11 + 1))
      .toDF("id", "st", "en")
    def peaks(parts: Int) =
      Relational.concurrency(iv.repartition(parts.toInt), "st", "en", Seq("id"))
        .groupBy("ts").agg(max("cur").as("m"))
        .orderBy("ts").as[(Long, Long)].collect().toSeq
    assert(peaks(1) == peaks(13))
  }
}
