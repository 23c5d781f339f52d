package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-input specs for the round-9 additions, covering the laws the
  * lake gate can't isolate: skyline vs a brute-force dominance reference
  * (ties included), the fuzzy join's blocking completeness vs brute-force
  * levenshtein (empty names, ed-2 exclusions), the rolling median against
  * a from-scratch sorted-window reference on even/odd/duplicate cases,
  * journey-pattern counts on hand-computed tie-broken journeys, and the
  * CMS family's certified-overestimate law. Each test writes a CRAFTED
  * lake (the table parquet files the query functions read) and drives the
  * REAL gate plan over it — no reimplementation of the query under test.
  */
class Round9OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Write each (name → df) as `<dir>/<name>.parquet` and hand back dir. */
  private def toyLake(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("r9-lake").toString
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  private def cleanup(dir: String): Unit =
    graft.operators.Checkpointing.deleteRecursively(dir)

  test("q_skyline equals brute-force dominance, ties kept on the frontier") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // crafted: two equal minimal points on one date (both members), a
    // later date undercutting (member), a later date tying the running
    // min (dominated — not strictly better), interior points dominated
    val orders = Seq(
      (1L, ts("1996-01-01 00:00:00"), 50.00),
      (2L, ts("1996-01-01 00:00:00"), 50.00), // tie: both in skyline
      (3L, ts("1996-01-01 00:00:00"), 60.00), // same date, higher: out
      (4L, ts("1996-02-01 00:00:00"), 40.00), // undercuts: in
      (5L, ts("1996-03-01 00:00:00"), 40.00), // ties prefix min: out
      (6L, ts("1996-03-01 00:00:00"), 35.00), // undercuts: in
      (7L, ts("1996-04-01 00:00:00"), 90.00)  // dominated: out
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = toyLake("orders" -> orders)
    try {
      val got = graft.queries.RelationalQueries.queries("q_skyline")(spark, dir)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      // brute force: o in skyline iff no other order has price<= AND
      // date<= with one strict
      val pts = orders.collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, math.round(r.getDouble(2) * 100)))
      val ref = pts.filter { case (k, d, p) =>
        !pts.exists { case (k2, d2, p2) =>
          k2 != k && d2 <= d && p2 <= p && (d2 < d || p2 < p)
        }
      }.map(_._1).toSet
      assert(ref == Set(1L, 2L, 4L, 6L))
      assert(got == ref, s"skyline $got != brute force $ref")
    } finally cleanup(dir)
  }

  test("q_fuzzy_join blocking is complete vs brute-force levenshtein, ed-2 excluded") {
    // empties, 1-char, substitution/insert/delete neighbors, an ed-2 pair
    val names = Seq(
      (0L, ""), (1L, "a"), (2L, "b"),       // ''-'a' ins; 'a'-'b' subst
      (3L, "ab"), (4L, "aab"), (5L, "abc"), // 'ab'-'aab' ins, 'ab'-'abc' ins
      (6L, "xy"), (7L, "qrs"),              // 'xy' ed2 from 'ab'; 'qrs' far
      (8L, "abc"))                          // exact dup of 5
    val dir = toyLake("customer" -> names.toDF("c_custkey", "c_name"))
    try {
      val got = graft.queries.RelationalQueries.queries("q_fuzzy_join")(spark, dir)
        .select("a_custkey", "b_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val ref = (for {
        (k1, n1) <- names; (k2, n2) <- names
        if k1 < k2 && lev(n1, n2) <= 1
      } yield (k1, k2)).toSet
      assert(ref.contains((0L, 1L)), "'' ↔ 'a' must be a reference pair")
      assert(!ref.exists(p => Set(p._1, p._2) == Set(3L, 6L)), "'ab'-'xy' is ed 2")
      assert(got == ref, s"fuzzy $got != brute force $ref")
    } finally cleanup(dir)
  }

  test("q_rolling_median matches a from-scratch sorted-window reference") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 35 items for one supplier (window saturates at 30), duplicates and
    // a second 3-item supplier (odd/even tiny-prefix cases)
    val prices1 = (1 to 35).map(i => ((i * 37) % 11 + 1) * 10.0)
    val li = (prices1.zipWithIndex.map { case (p, i) =>
      (101L, ts(f"1995-01-${i % 28 + 1}%02d 00:00:00"), i.toLong, i % 7, p)
    } ++ Seq(
      (202L, ts("1995-01-01 00:00:00"), 100L, 0, 10.0),
      (202L, ts("1995-01-02 00:00:00"), 101L, 0, 30.0),
      (202L, ts("1995-01-03 00:00:00"), 102L, 0, 20.0)))
      .toDF("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val dir = toyLake("lineitem" -> li)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_rolling_median")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // reference: per supplier in (shipdate, orderkey, linenumber) order,
      // med2 = doubled median of the trailing-30 cents window
      def ref(rows: Seq[(java.sql.Timestamp, Long, Int, Double)]) = {
        val cents = rows.sortBy(r => (r._1.getTime, r._2, r._3))
          .map(r => math.round(r._4 * 100))
        val med2s = cents.indices.map { i =>
          val w = cents.slice(math.max(0, i - 29), i + 1).sorted
          if (w.size % 2 == 1) w(w.size / 2) * 2
          else w(w.size / 2 - 1) + w(w.size / 2)
        }
        (cents.size.toLong, med2s.last, med2s.max, med2s.min)
      }
      val byKey = li.collect().map(r => (r.getLong(0),
        (r.getTimestamp(1), r.getLong(2), r.getInt(3), r.getDouble(4))))
        .groupBy(_._1).view.mapValues(v => ref(v.map(_._2).toSeq)).toMap
      assert(got == byKey, s"rolling median $got != reference $byKey")
    } finally cleanup(dir)
  }

  test("q_event_pattern counts hand-computed journeys incl. same-ts tie-break") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    def t0(off: Int) = java.sql.Timestamp.from(
      ts("2024-01-01 00:00:00").toInstant.plusSeconds(off.toLong))
    // u1: v c c p s v  → vc*p:1 (vccp), sv:1, v[ce]*p:1
    // u2 (tie ts, event_id breaks): e e e  → e{2,}:1
    // u3: v p  → vc*p:1 ('vc*p' with zero c), v[ce]*p:1
    val rows = Seq(
      (1L, 10L, "view", t0(0), 1.0), (1L, 11L, "click", t0(1), 1.0),
      (1L, 12L, "click", t0(2), 1.0), (1L, 13L, "purchase", t0(3), 1.0),
      (1L, 14L, "signup", t0(4), 1.0), (1L, 15L, "view", t0(5), 1.0),
      (2L, 21L, "error", t0(7), 1.0), (2L, 22L, "error", t0(7), 1.0),
      (2L, 23L, "error", t0(7), 1.0),
      (3L, 31L, "view", t0(9), 1.0), (3L, 32L, "purchase", t0(10), 1.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> rows)
    try {
      val got = graft.queries.BehaviorQueries.queries("q_event_pattern")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got("vc*p") == (2L, 2L))     // u1 + u3
      assert(got("sv") == (1L, 1L))       // u1
      assert(got("e{2,}") == (1L, 1L))    // u2 (one maximal run)
      assert(got("v[ce]*p") == (2L, 2L))  // u1 + u3
    } finally cleanup(dir)
  }

  test("CMS family: certified overestimate (overcount >= 0) on a skewed crafted lake") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // heavy skew: user 1 × 500, user 2 × 100, 1000 singletons — forces
    // real collisions in 1024 buckets so the law is non-vacuous
    val events = ((1 to 500).map(_ => 1L) ++ (1 to 100).map(_ => 2L) ++
      (100L to 1099L))
      .zipWithIndex.map { case (u, i) =>
        (u, i.toLong, "view", ts("2024-01-01 00:00:00"), 1.0) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val orders = (1L to 300L).map(k => (k, k % 50)).toDF("o_orderkey", "o_custkey")
    val dir = toyLake("events" -> events, "orders" -> orders)
    try {
      val top = graft.queries.RelationalQueries.queries("q_cms_topk")(spark, dir)
        .collect()
      assert(top.length == 20)
      top.foreach { r =>
        assert(r.getLong(4) >= 0L, s"CMS must never undercount: $r")
      }
      assert(top.head.getLong(1) == 1L && top.head.getLong(2) == 500L)
      val je = graft.queries.RelationalQueries.queries("q_join_estimate")(spark, dir)
        .head()
      // exact |orders ⋈ events|: custkeys 0..49 (6 orders each) hit user
      // singleton range 100..1099 nowhere; users 1, 2 have custkey
      // matches 1, 2 (6 orders each) → exact = 500·6 + 100·6 = 3600
      assert(je.getLong(1) == 3600L, s"exact join size: $je")
      assert(je.getLong(2) >= 0L, "join estimate must be an overestimate")
    } finally cleanup(dir)
  }

  test("q_interval_coverage: touching merges, strict gap splits, overlap counted once") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    def t0(off: Int) = java.sql.Timestamp.from(
      ts("2024-01-01 00:00:00").toInstant.plusSeconds(off.toLong))
    // span = 900 s. u1: 0 s and 300 s overlap (union [0, 1200)); 1200 s
    // TOUCHES the running end exactly (half-open: merges, end 2100);
    // 3000 s > 2100 → second island. u2: one event, one island.
    val rows = Seq(
      (1L, 10L, "view", t0(0), 1.0), (1L, 11L, "view", t0(300), 1.0),
      (1L, 12L, "view", t0(1200), 1.0), (1L, 13L, "view", t0(3000), 1.0),
      (2L, 20L, "view", t0(0), 1.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> rows)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_interval_coverage")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got(1L) == (2L, 3000000000L, 2100000000L, 4L),
        s"u1 islands: ${got(1L)}") // covered = 2100 s + 900 s
      assert(got(2L) == (1L, 900000000L, 900000000L, 1L))
    } finally cleanup(dir)
  }

  test("q_regression/q_autocorr: exact line, alternating series, degenerate exclusions") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    def day(i: Int) = ts(f"1996-01-${i + 1}%02d 00:00:00")
    // s1: perfect line 100 + 2·i over 5 days (slope exactly 2/day, r2 = 1);
    // s2: alternating 100/200 over 6 days (lag-1 autocorr → −1);
    // s3: constant over 3 days (slope 0; autocorr EXCLUDED — zero variance);
    // s4: one day only (excluded from regression: no trend from one point)
    val rows =
      (0 until 5).map(i => (1L, day(i), 100.0 + 2.0 * i)) ++
      (0 until 6).map(i => (2L, day(i), if (i % 2 == 0) 100.0 else 200.0)) ++
      (0 until 3).map(i => (3L, day(i), 77.0)) ++
      Seq((4L, day(0), 10.0))
    val li = rows.toDF("l_suppkey", "l_shipdate", "l_extendedprice")
    val dir = toyLake("lineitem" -> li)
    try {
      val reg = graft.queries.RelationalQueries.queries("q_regression")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
      assert(!reg.contains(4L), "single-day supplier carries no trend")
      assert(reg(1L)._1 == 5L && reg(1L)._2 == 2.0, s"exact slope: ${reg(1L)}")
      assert(reg(1L)._3 >= 0.9999, s"perfect line r2: ${reg(1L)}")
      assert(reg(3L)._2 == 0.0 && reg(3L)._3 == 1.0,
        s"constant series: slope 0, r2 pinned to 1: ${reg(3L)}")
      val ac = graft.queries.RelationalQueries.queries("q_autocorr")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(!ac.contains(3L), "zero-variance series has no autocorrelation")
      assert(!ac.contains(4L), "one observation has no pairs")
      assert(ac(2L)._1 == 5L && ac(2L)._2 <= -0.9999, s"alternating: ${ac(2L)}")
      assert(ac(1L)._2 >= 0.9999, s"monotone line autocorrelates +1: ${ac(1L)}")
    } finally cleanup(dir)
  }

  test("q_mode: highest count wins, smallest value breaks ties") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 'view': 2.0 ×2 beats 1.0 ×1; 'click': 3.0 and 4.0 tie at 1 → 3.0
    val events = Seq(
      (1L, 1L, "view", ts, 2.0), (2L, 1L, "view", ts, 2.0),
      (3L, 1L, "view", ts, 1.0),
      (4L, 1L, "click", ts, 4.0), (5L, 1L, "click", ts, 3.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> events)
    try {
      val got = graft.queries.RelationalQueries.queries("q_mode")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(got("view") == (2.0, 2L), s"got $got")
      assert(got("click") == (3.0, 1L), s"tie → smallest: $got")
    } finally cleanup(dir)
  }

  test("pipeline_token_drift: disjoint halves → 0.5, corpus-identical sources → 0") {
    def lake(rows: Seq[(Long, String, String)]): String = toyLake(
      "documents" -> rows.map { case (id, src, txt) =>
        (id, txt, "en", src, txt.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val disjoint = lake(Seq((1L, "s1", "x x"), (2L, "s2", "y y")))
    val identical = lake(Seq((1L, "s1", "a b"), (2L, "s2", "a b")))
    try {
      val d = graft.queries.TextQueries
        .queries("pipeline_token_drift")(spark, disjoint)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      // each source is half the corpus mass with a disjoint vocabulary:
      // TV(p_s, corpus) = 1/2 exactly
      assert(d == Map("s1" -> 0.5, "s2" -> 0.5), s"got $d")
      val i = graft.queries.TextQueries
        .queries("pipeline_token_drift")(spark, identical)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(i == Map("s1" -> 0.0, "s2" -> 0.0), s"got $i")
    } finally { cleanup(disjoint); cleanup(identical) }
  }

  test("text_collocations: bound phrase tops the lift ranking, support floor holds") {
    // "neural networks" always co-occur (5×, meets support); "the" is
    // frequent everywhere (low lift); "rare pair" appears 4× (below the
    // n_ab >= 5 support floor — excluded even though its lift is high)
    val docs = (1 to 5).map(i =>
      (i.toLong, "neural networks the cat the dog", "en", "s1", 30L)) ++
      (6 to 9).map(i => (i.toLong, "rare pair", "en", "s1", 9L))
    val dir = toyLake("documents" -> docs
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    try {
      val got = graft.queries.TextQueries.queries("text_collocations")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.head._1 == "neural" && got.head._2 == "networks" &&
        got.head._3 == 5L, s"got ${got.toSeq}")
      assert(!got.exists(p => p._1 == "rare"),
        s"support floor must exclude the 4-count pair: ${got.toSeq}")
    } finally cleanup(dir)
  }

  test("pipeline_schema_profile counts nulls and exact distincts per column") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, 1L, "view", ts, 1.0, """{"k":1}"""),
      (2L, 1L, "view", ts, 2.0, null),
      (3L, 2L, "click", ts, 1.0, null))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val dir = toyLake("events" -> events)
    try {
      val got = graft.queries.RelationalQueries
        .queries("pipeline_schema_profile")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got("event_id") == (3L, 0L, 3L))
      assert(got("props") == (3L, 2L, 1L), s"nulls counted, not distinct: $got")
      assert(got("value") == (3L, 0L, 2L))
      assert(got("event_type") == (3L, 0L, 2L))
    } finally cleanup(dir)
  }

  test("q_ab_test: clear separation flags significant, identical arms do not") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // control 'view' tightly around 10; arm 'click' around 20 (clearly
    // significant); arm 'page' identical to control (z == 0, not flagged)
    val rows =
      (1 to 40).map(i => (i.toLong, 1L, "view", ts,
        if (i % 2 == 0) 9.9 else 10.1)) ++
      (41 to 80).map(i => (i.toLong, 1L, "click", ts,
        if (i % 2 == 0) 19.9 else 20.1)) ++
      (81 to 120).map(i => (i.toLong, 1L, "page", ts,
        if (i % 2 == 0) 9.9 else 10.1))
    val dir = toyLake("events" -> rows.map { case (a, b, c, d, e) =>
      (a, b, c, d, e, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props"))
    try {
      val got = graft.queries.RelationalQueries.queries("q_ab_test")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(4), r.getInt(5))).toMap
      assert(got("click")._1 == 20.0 && got("click")._3 == 1,
        s"clear lift must flag: $got")
      assert(got("page")._2 == 0.0 && got("page")._3 == 0,
        s"identical arm must not flag: $got")
    } finally cleanup(dir)
  }

  test("q_gini: perfect equality → 0, one-whale concentration → near 1, ties exact") {
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    // EQ: 4 customers × 100.00 (gini 0, with ties exercising the run
    // algebra); WHALE: 9 × 0.01 + 1 × 1000.00
    val orders = (
      (1 to 4).map(i => (i.toLong, i.toLong, 100.0)) ++
      (11 to 19).map(i => (i.toLong, i.toLong, 0.01)) ++
      Seq((20L, 20L, 1000.0)))
      .map { case (ok, ck, p) => (ok, ck, "O", p, ts, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = ((1 to 4).map(i => (i.toLong, "EQ")) ++
      (11 to 20).map(i => (i.toLong, "WHALE")))
      .map { case (k, seg) => (k, s"c$k", 1L, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val dir = toyLake("orders" -> orders, "customer" -> customer)
    try {
      val got = graft.queries.RelationalQueries.queries("q_gini")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got("EQ") == (4L, 0.0), s"equal shares: $got")
      // exact: n=10, S=100009, W = Σ rank·x = (1·1+...+9·1) + 10·100000
      // = 45 + 1000000; gini = (2·1000045 − 11·100009)/(10·100009)
      val g = (2.0 * 1000045 - 11 * 100009) / (10.0 * 100009)
      assert(math.abs(got("WHALE")._2 - math.floor(g * 10000) / 10000) < 1e-9,
        s"whale concentration: $got vs $g")
    } finally cleanup(dir)
  }

  test("q_histogram_union: summed buckets cross at hand-computed union quantiles") {
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    // A: 10 × 100.00 (cents 10000 → bucket 0); B: 10 × 2000.00 (cents
    // 200000 → bucket 3). Union n=20: p50 crosses at bucket 0's upper
    // edge (65536/100 = 655.36); p95 target 380 lands in bucket 3 at
    // (3·65536 + 65536·180/200)/100 = 2555.904.
    val li = ((1 to 10).map(i => ("A", 100.0, i)) ++
      (1 to 10).map(i => ("B", 2000.0, i)))
      .map { case (f, p, i) =>
        (i.toLong, 1L, 1L, i, 1.0, p, 0.0, 0.0, f, "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = toyLake("lineitem" -> li)
    try {
      val rows = graft.queries.RelationalQueries
        .queries("q_histogram_union")(spark, dir).collect()
      assert(rows.length == 1)
      val r = rows.head
      assert((r.getString(0), r.getString(1), r.getLong(2)) == ("A", "B", 20L))
      assert(r.getDouble(3) == 655.36, s"union p50 from summed buckets: $r")
      assert(math.abs(r.getDouble(4) - 2555.904) < 1e-9, s"union p95: $r")
      assert(r.getDouble(5) == 1050.0, s"exact interpolated union median: $r")
    } finally cleanup(dir)
  }

  test("q_freshness: lag from the global watermark; stale strictly beyond 6h; 24h window half-open") {
    def t0(offUs: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L).plusNanos(offUs * 1000))
    val dayUs = 86400000000L
    val events = Seq(
      (1L, 1L, "fresh", t0(dayUs * 2), 1.0),            // the watermark
      (2L, 1L, "edge", t0(dayUs * 2 - 21600000000L), 1.0), // lag == 6h
      (3L, 1L, "stale", t0(0), 1.0),                    // lag 2 days
      (4L, 1L, "fresh", t0(dayUs), 1.0))                // exactly wm − 24h
      .map { case (a, b, c, d, e) => (a, b, c, d, e, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val dir = toyLake("events" -> events)
    try {
      val got = graft.queries.RelationalQueries.queries("q_freshness")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
      assert(got("fresh") == (2L, 0L, 1L, 0),
        s"wm feed: lag 0; the wm−24h event is OUTSIDE the half-open window: $got")
      assert(got("edge") == (1L, 21600000000L, 1L, 0),
        s"lag exactly 6h is NOT stale (strict >): $got")
      assert(got("stale")._4 == 1 && got("stale")._3 == 0L, s"2-day lag: $got")
    } finally cleanup(dir)
  }

  test("q_seasonality: all revenue on one epoch-weekday indexes at 7, the rest at 0") {
    // 1970-01-01 is epoch day 0 → weekday 0; 1970-01-02 → weekday 1
    val d0 = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
    val d1 = java.sql.Timestamp.valueOf("1970-01-02 00:00:00")
    val orders = Seq(
      (1L, 1L, "O", 100.0, d0, "x"), (2L, 1L, "O", 300.0, d0, "x"),
      (3L, 1L, "O", 0.0, d1, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = toyLake("orders" -> orders)
    try {
      val got = graft.queries.RelationalQueries.queries("q_seasonality")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got(0L) == (2L, 400.0, 7.0), s"all mass on weekday 0: $got")
      assert(got(1L) == (1L, 0.0, 0.0), s"zero-revenue weekday: $got")
    } finally cleanup(dir)
  }

  test("q_market_basket: presence semantics (in-order duplicates collapse), exact lift") {
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    // o1 {1, 2, 2, 3} (part 2 twice — MUST dedup), o2 {1, 2}, o3 {4}:
    // B = 3, n_1 = n_2 = 2; pair (1,2) co-occurs twice → lift 2·3/(2·2)
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (3L, 4L))
    val li = rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i, 1.0, 10.0, 0.0, 0.0, "A", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = toyLake("lineitem" -> li)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_market_basket")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(5))).toMap
      assert(got((1L, 2L)) == (2L, 1.5),
        s"duplicate part in o1 must not inflate n_ab: $got")
      assert(got((1L, 3L)) == (1L, 1.5) && got((2L, 3L)) == (1L, 1.5))
      assert(!got.keySet.exists(_._2 == 4L), "singleton basket pairs with nothing")
    } finally cleanup(dir)
  }

  test("q_benford: organic log-spread passes, constant-leading-digit feed fails") {
    val ts96 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val ts97 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val rnd = new scala.util.Random(7)
    // 1996: amounts log-uniform over 4 decades — first digits follow
    // Benford closely; 1997: every amount starts with 5 — flunks
    val organic = (1 to 2000).map { i =>
      (i.toLong, 1L, math.pow(10.0, 1.0 + 4.0 * rnd.nextDouble()), ts96) }
    val flat = (2001 to 2400).map { i => (i.toLong, 1L, 555.0, ts97) }
    val orders = (organic ++ flat)
      .map { case (ok, ck, p, t) =>
        (ok, ck, "O", math.rint(p * 100) / 100, t, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = toyLake("orders" -> orders)
    try {
      val got = graft.queries.RelationalQueries.queries("q_benford")(spark, dir)
        .collect().map(r => r.getInt(0) -> (r.getDouble(2), r.getInt(3))).toMap
      assert(got(1996)._2 == 1, s"log-uniform passes Benford: $got")
      assert(got(1997)._2 == 0 && got(1997)._1 > 1000,
        s"single-digit feed must flunk loudly: $got")
    } finally cleanup(dir)
  }
}
