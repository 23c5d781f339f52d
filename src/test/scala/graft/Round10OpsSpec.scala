package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-input specs for the round-10 additions: unpivot's reshape
  * round-trip (incl. absent-cell exclusion), gaps-and-islands against
  * hand-expected streaks, Spearman's tie handling against a from-scratch
  * average-rank reference (plus the exact ±1 monotone laws), chi-squared
  * against hand-computed 2×2 rationals, and the decile profile's PrefixSum
  * ranking against the single-window reference. Each test writes a crafted
  * lake and drives the REAL gate plan — no reimplementation of the query
  * under test.
  */
class Round10OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def toyLake(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("r10-lake").toString
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  private def cleanup(dir: String): Unit =
    graft.operators.Checkpointing.deleteRecursively(dir)

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def tsAt(days: Double) = java.sql.Timestamp.from(
    ts0.toInstant.plusSeconds(math.round(days * 86400)))

  test("q_unpivot: melt(pivot(events)) equals the long-form aggregate; " +
      "absent cells are excluded") {
    // u1 has view+click, u2 only purchase — (u1,purchase), (u2,view) etc.
    // must NOT appear as null/zero rows after the round-trip
    val events = Seq(
      (1L, 1L, "view", ts0, 1.25), (2L, 1L, "view", ts0, 2.50),
      (3L, 1L, "click", ts0, 0.75),
      (4L, 2L, "purchase", ts0, 9.99))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> events)
    try {
      val got = graft.queries.RelationalQueries.queries("q_unpivot")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      assert(got == Map(
        (1L, "view") -> 3.75, (1L, "click") -> 0.75,
        (2L, "purchase") -> 9.99), s"got $got")
    } finally cleanup(dir)
  }

  test("q_islands: runs split exactly on missing days; longest-streak " +
      "argmax prefers the earliest start on ties") {
    // u1: days 0,1,2 | 5 | 7,8  → 3 islands, longest 3 @ 0
    // u2: days 3,4 | 9,10       → 2 islands of 2 — tie → start 3
    // duplicate events inside one day must not inflate n_days
    val rows = Seq(
      (1L, 0.1), (1L, 0.5), (1L, 1.2), (1L, 2.7), (1L, 5.3), (1L, 7.1),
      (1L, 8.9),
      (2L, 3.5), (2L, 4.5), (2L, 9.5), (2L, 10.5))
    val events = rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, u, "view", tsAt(d), 1.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> events)
    try {
      val day0 = ts0.toInstant.getEpochSecond * 1000000L / 86400000000L
      val got = graft.queries.RelationalQueries.queries("q_islands")(spark, dir)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4) - day0)))
        .toMap
      assert(got(1L) == ((3L, 6L, 3L, 0L)), s"got $got")
      assert(got(2L) == ((2L, 4L, 2L, 3L)), s"tie → earliest start: $got")
    } finally cleanup(dir)
  }

  test("q_spearman: monotone → +1, antitone → −1, ties match the " +
      "average-rank reference, constant column excluded") {
    // flag A: y strictly increasing in x (not linearly — Spearman must
    // still be exactly 1 where Pearson would not be)
    val a = Seq((1.0, 1.00), (2.0, 4.00), (3.0, 9.00), (4.0, 95.50))
    // flag B: strictly decreasing
    val b = Seq((1.0, 50.0), (2.0, 40.0), (3.0, 10.0))
    // flag C: heavy ties on both sides
    val c = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 5.0), (2.0, 7.0), (3.0, 7.0),
      (3.0, 2.0), (1.0, 2.0))
    // flag D: constant x → zero rank variance → excluded
    val d = Seq((2.0, 1.0), (2.0, 2.0), (2.0, 3.0))
    val lineitem = Seq("A" -> a, "B" -> b, "C" -> c, "D" -> d).flatMap {
      case (f, rows) => rows.map { case (q, p) => (f, q, p) }
    }.toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val dir = toyLake("lineitem" -> lineitem)
    try {
      val got = graft.queries.RelationalQueries.queries("q_spearman")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      // ±1 up to the floor-quantization of sqrt-rounded doubles (floor
      // sits one grid cell BELOW the exact value when the float lands
      // under it — 0.9999 / −1.0001 are the correct quantized outputs;
      // the gate's claim is cross-engine identity, not grid alignment)
      assert(math.abs(got("A") - 1.0) <= 1e-4 &&
        math.abs(got("B") + 1.0) <= 1e-4, s"got $got")
      assert(!got.contains("D"), s"constant x must be excluded: $got")
      // from-scratch tie-averaged Spearman for C
      def avgRanks(vs: Seq[Long]): Seq[Double] = {
        val byV = vs.sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
        vs.map(byV)
      }
      val xs = avgRanks(c.map(r => math.round(r._1)))
      val ys = avgRanks(c.map(r => math.round(r._2 * 100)))
      val n = xs.size
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sd = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) *
        math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
      val ref = math.floor(cov / sd * 10000) / 10000
      assert(math.abs(got("C") - ref) <= 1e-4 + 1e-12,
        s"tie-averaged rho: got ${got("C")} ref $ref")
    } finally cleanup(dir)
  }

  test("q_chi_square: hand-computed 2×2 rationals (expected, contrib, " +
      "total) and marginal invariants") {
    // two types × two weekdays; epoch day of 2024-01-01 is a Monday →
    // dow ((day+4) % 7) = 1 for Mon, 2 for Tue
    // contingency: view:(mon 3, tue 1), click:(mon 1, tue 3) → N=8,
    // rows 4/4, cols 4/4, every expected = 2, every |o−e| = 1 →
    // contrib = 1/2 each, chi² = 2
    val cells = Seq(("view", 0, 3), ("view", 1, 1), ("click", 0, 1),
      ("click", 1, 3))
    val events = cells.flatMap { case (t, dayOff, cnt) =>
      (1 to cnt).map(i => (t, dayOff, i))
    }.zipWithIndex.map { case ((t, dayOff, _), i) =>
      (i.toLong, 1L, t, tsAt(dayOff + 0.5), 1.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = toyLake("events" -> events)
    try {
      val rows = graft.queries.RelationalQueries
        .queries("q_chi_square")(spark, dir).collect()
      assert(rows.length == 4)
      rows.foreach { r =>
        assert(r.getDouble(3) == 2.0, s"expected: $r")
        assert(r.getDouble(4) == 0.5, s"contrib: $r")
        assert(r.getDouble(5) == 2.0, s"total: $r")
      }
      assert(rows.map(_.getLong(2)).sum == 8L)
    } finally cleanup(dir)
  }

  private def docLake(rows: Seq[(Long, String, String)]): String = toyLake(
    "documents" -> rows.map { case (id, src, txt) =>
      (id, txt, "en", src, txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("dedup_normalized: case/punctuation/spacing variants collapse into " +
      "one canonical group; distinct text stays apart") {
    val dir = docLake(Seq(
      (1L, "s0", "Hello, World!"),
      (2L, "s0", "hello world"),
      (3L, "s1", "HELLO   world"),
      (4L, "s1", "a genuinely different document"),
      (5L, "s1", "a genuinely different document")))
    try {
      val got = graft.queries.DedupQueries.queries("dedup_normalized")(spark, dir)
        .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      // 1,2,3 → one canonical group (3 copies, 3 distinct raws);
      // 4,5 → one group of 2 byte-identical copies (1 raw variant)
      assert(got == Map(1L -> ((3L, 3L)), 4L -> ((2L, 1L))), s"got $got")
    } finally cleanup(dir)
  }

  test("pipeline_temperature_sample: sqrt weights flatten a 4:1 token " +
      "mass to 2:1 shares; integer targets allocate by floor") {
    // s0: 4 docs × 100 tokens = 400; s1: 1 doc × 100 = 100
    def doc(n: Int) = (1 to n).map(i => s"tok$i").mkString(" ")
    val dir = docLake(Seq(
      (1L, "s0", doc(100)), (2L, "s0", doc(100)), (3L, "s0", doc(100)),
      (4L, "s0", doc(100)), (5L, "s1", doc(100))))
    try {
      val got = graft.queries.PipelineQueries
        .queries("pipeline_temperature_sample")(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
            r.getLong(5)))).toMap
      // w4: floor(sqrt(400)·1e4) = 200000, floor(sqrt(100)·1e4) = 100000
      // shares: 200000·1e4 div 300000 = 6666 → 0.6666; 3333 → 0.3333
      // targets over nd div 2 = 2: (2·200000) div 300000 = 1; s1 → 0
      assert(got("s0") == ((4L, 400L, 200000L, 0.6666, 1L)), s"got $got")
      assert(got("s1") == ((1L, 100L, 100000L, 0.3333, 0L)), s"got $got")
    } finally cleanup(dir)
  }

  test("pipeline_curriculum: phases cut the quality-desc order into " +
      "terciles; quality bands are disjoint and monotone") {
    // quality is driven by token count (length term of the score) — 12
    // docs with clearly distinct scores
    def doc(n: Int) = (1 to n).map(i => s"the w$i of a").mkString(" ")
    val dir = docLake((1 to 12).map(i => (i.toLong, "s0", doc(i * 6))))
    try {
      val rows = graft.queries.PipelineQueries
        .queries("pipeline_curriculum")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
      assert(rows.map(_._2).toSeq == Seq(4L, 4L, 4L), s"equal terciles: ${rows.toSeq}")
      // phase 0 = cleanest: its worst quality ≥ phase 1's best, etc.
      rows.sliding(2).foreach {
        case Array((_, _, _, worse0), (_, _, best1, _)) =>
          assert(worse0 >= best1, s"phases out of order: ${rows.toSeq}")
        case _ =>
      }
    } finally cleanup(dir)
  }

  test("text_winnowing matches a from-scratch reference (selection rule, " +
      "dedup, short-doc degenerate window) and the duplicate-doc law") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "one two"),                         // < k tokens → 1 whole gram
      (3L, ""),                                // empty → 1 empty gram
      (4L, "the quick brown fox jumps over the lazy dog today"), // dup of 1
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"))
    val dir = docLake(texts.map { case (id, t) => (id, "s0", t) })
    try {
      val got = graft.queries.TextQueries.queries("text_winnowing")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      def ref(text: String): (Long, Long, Long) = {
        val toks = text.trim.toLowerCase.split("[ \t\n\f\r]+", -1).toSeq
        val grams = if (toks.size < 3) Seq(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        val md = java.security.MessageDigest.getInstance("MD5")
        def h(g: String): Long = java.lang.Long.parseLong(
          md.digest(g.getBytes("UTF-8")).take(5).map("%02x".format(_)).mkString, 16)
        val cks = grams.zipWithIndex.map { case (g, p) =>
          (p, h(g) * 65536L + (65535L - p)) }
        val n = cks.size
        val sels = cks.indices
          .filter(p => p >= 3 || (n < 4 && p == n - 1))
          .map(p => cks.slice(math.max(0, p - 3), p + 1).map(_._2).min)
          .distinct
        (n.toLong, sels.size.toLong, sels.map(_ % 1000000007L).sum)
      }
      texts.foreach { case (id, t) =>
        assert(got(id) == ref(t), s"doc $id: got ${got(id)} ref ${ref(t)}")
      }
      assert(got(1L) == got(4L), "byte-identical docs → identical fingerprints")
    } finally cleanup(dir)
  }

  test("q_runs_test: alternating series → maximal runs (positive z), " +
      "clustered series → 2 runs (negative z), reference z math") {
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    def at(i: Int) = java.sql.Timestamp.from(ts.toInstant.plusSeconds(i * 86400L))
    // supplier 1: 10,90 alternating ×5 — n1=n2=5, runs=10 (maximal)
    // supplier 2: 10×5 then 90×5 — runs=2 (clustered)
    // supplier 3: constant → all "not above" → a=0 → excluded
    val rows =
      (0 until 10).map(i => (1L, at(i), 100L + i, 1,
        if (i % 2 == 0) 10.0 else 90.0)) ++
      (0 until 10).map(i => (2L, at(i), 200L + i, 1,
        if (i < 5) 10.0 else 90.0)) ++
      (0 until 4).map(i => (3L, at(i), 300L + i, 1, 50.0))
    val lineitem = rows.toDF("l_suppkey", "l_shipdate", "l_orderkey",
      "l_linenumber", "l_extendedprice")
    val dir = toyLake("lineitem" -> lineitem)
    try {
      val got = graft.queries.RelationalQueries.queries("q_runs_test")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5)))).toMap
      assert(!got.contains(3L), s"constant series must be excluded: $got")
      def refZ(n: Long, n1: Long, runs: Long): Double = {
        val a = 2.0 * n1 * (n - n1)
        math.floor((runs - (a / n + 1.0)) /
          math.sqrt(a * (a - n) / (n.toDouble * n * (n - 1))) * 10000) / 10000
      }
      assert(got(1L) == ((10L, 5L, 5L, 10L, refZ(10, 5, 10))), s"got $got")
      assert(got(2L) == ((10L, 5L, 5L, 2L, refZ(10, 5, 2))), s"got $got")
      assert(got(1L)._5 > 0 && got(2L)._5 < 0,
        "alternation must score positive, clustering negative")
    } finally cleanup(dir)
  }

  test("emb_mrl_recall: when all signal lives in the 16-dim prefix the " +
      "truncated ranking is the full ranking — recall 1.0") {
    val rnd = new scala.util.Random(7)
    // 40 vectors: random 16-dim prefix, dims 17..64 exactly zero — the
    // truncated cosine IS the full cosine
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1) ++
        Array.fill(48)(0.0f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val dir = toyLake("embeddings" -> vecs)
    try {
      val got = graft.queries.VectorQueries.queries("emb_mrl_recall")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.length == 5)
      got.foreach { case (q, nEx, nHit, rec) =>
        assert(nEx == 10L && nHit == 10L && rec == 1.0,
          s"prefix-only signal must give perfect recall: q=$q $nEx $nHit $rec")
      }
    } finally cleanup(dir)
  }

  test("text_lang_confusion: hand-crafted marker docs land on the " +
      "diagonal; marker-free docs fall into the 'und' column") {
    val dir = docLake(Seq(
      (1L, "s0", "the cat and the dog of the house"),   // en markers
      (2L, "s0", "der hund und die katze ist nicht"),   // de markers
      (3L, "s0", "qwerty zxcvb plmokn"),                // no markers → und
      (4L, "s0", "the house of the king and it is")))   // en again
    try {
      val got = graft.queries.TextQueries
        .queries("text_lang_confusion")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      // docLake writes lang = "en" for every row, so truth axis is 'en'
      assert(got(("en", "en")) == ((2L, 0.5)), s"got $got")
      assert(got(("en", "de")) == ((1L, 0.25)), s"got $got")
      assert(got(("en", "und")) == ((1L, 0.25)), s"got $got")
    } finally cleanup(dir)
  }

  test("pipeline_epoch_shuffle: epochs are equal-size, orders differ, " +
      "and epoch 0 matches a from-scratch md5 ordering reference") {
    val dir = docLake((1 to 40).map(i => (i.toLong, "s0", s"doc $i")))
    try {
      val got = graft.queries.PipelineQueries
        .queries("pipeline_epoch_shuffle")(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got.keySet == Set(0L, 1L, 2L))
      assert(got.values.forall(_._1 == 40L), s"equal sizes: $got")
      assert(got.values.map(_._4).toSet.size == 3,
        s"per-epoch orders must differ: $got")
      // from-scratch epoch-0 reference
      val md = java.security.MessageDigest.getInstance("MD5")
      def k(e: Long, id: Long): Long = java.lang.Long.parseLong(
        md.digest(s"$e:$id".getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString, 16)
      for (e <- 0L to 2L) {
        val order = (1L to 40L).map(id => (k(e, id), id)).sortBy(identity)
        val cs = order.zipWithIndex
          .map { case ((_, id), i) => (i + 1L) % 83003L * (id % 83003L) }
          .sum % 1000000007L
        assert(got(e) == ((40L, order.head._2, order.last._2, cs)),
          s"epoch $e: got ${got(e)} ref ${(40L, order.head._2, order.last._2, cs)}")
      }
    } finally cleanup(dir)
  }

  test("emb_confusion: well-separated crafted clusters give a diagonal " +
      "matrix; mixed-in vectors land on their nearest label") {
    val rnd = new scala.util.Random(11)
    // label 0 clusters near +e1, label 1 near +e2, label 2 near +e3 —
    // tight noise, so every vector's nearest centroid is its own label;
    // then vec 90 carries label 0 but sits ON label 1's axis (planted
    // off-diagonal mass)
    def v(axis: Int, eps: Float) = Array.tabulate(64)(j =>
      (if (j == axis) 1f else 0f) + (rnd.nextFloat() - 0.5f) * eps)
    val vecs = ((0 until 90).map(i => (i.toLong, v(i % 3, 0.05f), i % 3)) :+
      ((90L, v(1, 0.0f), 0))).toDF("vec_id", "embedding", "label")
    val dir = toyLake("embeddings" -> vecs)
    try {
      val got = graft.queries.VectorQueries.queries("emb_confusion")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got((0L, 0L)) == 30L && got((1L, 1L)) == 30L &&
        got((2L, 2L)) == 30L, s"diagonal: $got")
      assert(got((0L, 1L)) == 1L, s"planted off-diagonal: $got")
      assert(got.values.sum == 91L)
    } finally cleanup(dir)
  }

  test("knn_filtered: every neighbor shares the query's label and the " +
      "ranking equals the filtered brute-force reference") {
    val rnd = new scala.util.Random(12)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), i % 3))
      .toDF("vec_id", "embedding", "label")
    val dir = toyLake("embeddings" -> vecs)
    try {
      val got = graft.queries.VectorQueries.queries("knn_filtered")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val data = vecs.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var (d, na, nb) = (0.0, 0.0, 0.0)
        for (j <- a.indices) { d += a(j).toDouble * b(j); na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j) }
        math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 10000) / 10000.0
      }
      val ref = data.filter(_._1 < 5).flatMap { case (q, qv, ql) =>
        data.filter(x => x._1 != q && x._3 == ql)
          .map(x => (q, x._1, cos(qv, x._2)))
          .sortBy { case (_, nid, c) => (-c, nid) }.take(10).zipWithIndex
          .map { case ((qq, nid, c), i) => (qq, i.toLong + 1, nid, c) }
      }.toSet
      assert(got.toSet == ref, s"got ${got.toSet.diff(ref)} missing ${ref.diff(got.toSet)}")
      val lbl = data.map(x => x._1 -> x._3).toMap
      got.foreach { case (q, _, nid, _) =>
        assert(lbl(q.toInt) == lbl(nid.toInt), "cross-label neighbor leaked")
      }
    } finally cleanup(dir)
  }

  test("q_bucketed_join: the gate query's own join is exchange-free " +
      "below the join node (the co-location claim, on the gate plan)") {
    val sf = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.queries.RelationalQueries
        .queries("q_bucketed_join")(spark, sf)
      assert(df.count() > 0)
      // AQE wraps the plan, so traverse the final printout: children print
      // BELOW their parent — the aggregate's exchange sits above the join,
      // so everything after the SortMergeJoin line must be exchange-free
      val plan = df.queryExecution.executedPlan.toString
      val at = plan.indexOf("SortMergeJoin")
      assert(at >= 0, s"expected a sort-merge join in the gate plan:\n" +
        plan.take(3000))
      val below = plan.substring(at)
      assert(!below.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${below.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_forecast_eval: calendar-joined naive forecast on a GAPPED " +
      "two-year series — a month with no orders must not shift the " +
      "baseline (hand-computed MAE/WAPE)") {
    // one priority, year-1 = 100.00/mo (all 12 months), year-2 =
    // 110.00/mo but month 6 has NO orders: 11 eval months, each
    // forecast against its TRUE m−12 (a row-offset lag would misalign
    // every month after the gap), |err| = 10.00 each:
    // MAE = 10.0, WAPE = 11000/121000 → floor 4dp 0.0909
    val rows = for {
      y <- Seq(1996, 1997); mth <- 1 to 12
      if !(y == 1997 && mth == 6)
    } yield (y.toLong * 100 + mth, "1-URGENT",
      java.sql.Timestamp.valueOf(f"$y-$mth%02d-15 00:00:00"),
      if (y == 1996) 100.00 else 110.00)
    val orders = rows.toDF("o_orderkey", "o_orderpriority", "o_orderdate",
      "o_totalprice")
    val dir = toyLake("orders" -> orders)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_forecast_eval")(spark, dir).collect()
      assert(got.length == 1)
      val r = got.head
      assert(r.getString(0) == "1-URGENT" && r.getLong(1) == 11L, s"$r")
      assert(r.getDouble(2) == 10.0, s"mae: $r")
      assert(r.getDouble(3) == 0.0909, s"wape: $r")
    } finally cleanup(dir)
  }

  test("text_derep: consecutive duplicates collapse (case-sensitive, " +
      "non-adjacent repeats kept), whitespace normalizes, empty doc intact") {
    val dir = docLake(Seq(
      (1L, "s0", "the the the quick quick fox"),
      (2L, "s0", "a b a b a"),             // non-adjacent: nothing removed
      (3L, "s0", "The the THE the"),       // case-sensitive: only exact runs
      (4L, "s0", "one\t\tone   two"),      // whitespace runs normalize
      (5L, "s0", "")))
    try {
      val md = (s: String) => {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val got = graft.queries.TextQueries.queries("text_derep")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got(1L) == ((6L, 3L, md("the quick fox"))), s"got ${got(1L)}")
      assert(got(2L) == ((5L, 0L, md("a b a b a"))), s"got ${got(2L)}")
      assert(got(3L) == ((4L, 0L, md("The the THE the"))), s"got ${got(3L)}")
      assert(got(4L) == ((3L, 1L, md("one two"))), s"got ${got(4L)}")
      assert(got(5L) == ((0L, 0L, md(""))), s"got ${got(5L)}")
    } finally cleanup(dir)
  }

  test("Derep native kernel is bit-equal to the HOF reference chain on " +
      "nasty strings (edge whitespace, unicode, empties)") {
    val texts = Seq(
      "the the the quick quick fox", "a b a b a", "The the THE the",
      "one\t\tone   two", "", "   ", "\tx x\t", "é é 中文 中文 中文 😀",
      "solo", "x x", " x x ", "a\n\na a")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("dr", graft.plans.Derep(spark, org.apache.spark.sql.functions.col("text")))
      .withColumn("toks", graft.functions.Text.wsTokens(org.apache.spark.sql.functions.col("text")))
      .withColumn("kept", org.apache.spark.sql.functions.expr(
        "filter(toks, (t, i) -> i = 0 OR t != element_at(toks, greatest(i, 1)))"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("dr.clean"),
        org.apache.spark.sql.functions.col("dr.n_removed"),
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.col("kept"), " ").as("ref_clean"),
        (org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("toks")) -
          org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("kept")))
          .as("ref_removed"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(3),
        s"doc ${r.getLong(0)}: native '${r.getString(1)}' vs HOF '${r.getString(3)}'")
      assert(r.getInt(2) == r.getInt(4),
        s"doc ${r.getLong(0)}: removed ${r.getInt(2)} vs ${r.getInt(4)}")
    }
  }

  test("audioDownsample: frame-granular decimation (stereo frames intact, " +
      "partial tail dropped), half rate, container roundtrip") {
    import graft.functions.MediaCodecs
    // stereo, 7 frames + 1 trailing partial byte (dropped): frames 0,2,4,6
    val stereo = Array.tabulate[Byte](15)(i => (i * 7 + 3).toByte)
    // mono, 5 samples → 3 out (0,2,4)
    val mono = Array.tabulate[Byte](5)(i => (100 + i).toByte)
    val media = Seq(
      graft.operators.MediaRecord(1L, "audio",
        MediaCodecs.encodeWav(16000, 2, 8, stereo), "s0"),
      graft.operators.MediaRecord(2L, "audio",
        MediaCodecs.encodeWav(8000, 1, 8, mono), "s0"),
      graft.operators.MediaRecord(3L, "image", Array[Byte](1, 2), "s0"))
    val df = spark.createDataFrame(media)
    val got = graft.operators.Multimodal.audioDownsample(spark, df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(!got.contains(3L), "non-audio rows must not decode")
    // stereo: frames = 15/2 = 7, out = 4 frames = 8 bytes, container 52
    val expStereo = Array(0, 1, 4, 5, 8, 9, 12, 13).map(stereo(_))
    assert(got(1L) == ((16000L, 8000L, 2L, 7L, 4L, 52L, 8L,
      MediaCodecs.energyHash(expStereo))), s"got ${got(1L)}")
    val expMono = Array(0, 2, 4).map(mono(_))
    assert(got(2L) == ((8000L, 4000L, 1L, 5L, 3L, 47L, 3L,
      MediaCodecs.energyHash(expMono))), s"got ${got(2L)}")
  }

  test("q_ntile_profile: PrefixSum tiers equal the single-window " +
      "reference; counts sum to n and boundaries are monotone") {
    val rnd = new scala.util.Random(10)
    // 97 customers (not divisible by 10 — exercises remainder placement),
    // duplicate spends included so the custkey tie-break matters
    val orders = (1 to 97).flatMap { ck =>
      val n = 1 + rnd.nextInt(3)
      (1 to n).map(i => (ck.toLong * 100 + i, ck.toLong,
        (rnd.nextInt(40) + 1) * 25.0))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dir = toyLake("orders" -> orders)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_ntile_profile")(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      // reference: local total order over the per-customer sums
      val spends = orders.collect()
        .map(r => r.getLong(1) -> math.round(r.getDouble(2) * 100))
        .groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2).sum) }.toSeq
        .sortBy { case (ck, cents) => (cents, ck) }
      val n = spends.size
      val ref = spends.zipWithIndex
        .groupBy { case (_, i) => i.toLong * 10 / n }
        .map { case (d, g) =>
          d -> ((g.size.toLong, g.map(_._1._2).min / 100.0,
            g.map(_._1._2).max / 100.0))
        }
      assert(got == ref, s"got $got\nref $ref")
      assert(got.values.map(_._1).sum == n.toLong)
      val ds = got.toSeq.sortBy(_._1).map(_._2)
      ds.sliding(2).foreach {
        case Seq((_, _, hi), (_, lo, _)) => assert(hi <= lo,
          "decile boundaries must be monotone")
        case _ =>
      }
    } finally cleanup(dir)
  }
}
