package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the round-12 gated keys. The Kruskal–Wallis
  * tests exist for a structural reason: the statistic's formula is
  * MIRRORED between the engine and its oracle, so a shared scaling error
  * passes the hash gate by construction — only an independently computed
  * expected value catches it (it did: the first cut double-applied the
  * doubled-rank /4 and gated green at 1.4× the true H). */
class Round12OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def toyLake(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("r12-lake").toString
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  private def cleanup(dir: String): Unit =
    graft.operators.Checkpointing.deleteRecursively(dir)

  private def orders(rows: Seq[(String, String, Double)]): DataFrame =
    rows.toDF("o_orderstatus", "o_orderpriority", "o_totalprice")

  test("q_kruskal_wallis: textbook no-tie case — three perfectly " +
      "separated pairs give H = 4.5714") {
    // A {1,2}, B {3,4}, C {5,6} cents → ranks 1..6, R = 3/7/11,
    // H = 12/(6·7)·(9+49+121)/2 − 3·7 = 25.5714… − 21 = 4.571428…
    val dir = toyLake("orders" -> orders(Seq(
      ("F", "1-URGENT", 0.01), ("F", "1-URGENT", 0.02),
      ("F", "3-MEDIUM", 0.03), ("F", "3-MEDIUM", 0.04),
      ("F", "5-LOW", 0.05), ("F", "5-LOW", 0.06))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_kruskal_wallis")(spark, dir).collect()
      assert(got.length == 1)
      assert((got(0).getString(0), got(0).getLong(1), got(0).getLong(2),
        got(0).getDouble(3)) == (("F", 6L, 3L, 4.5714)), s"got ${got(0)}")
    } finally cleanup(dir)
  }

  test("q_kruskal_wallis: tie correction — two all-tied pairs give " +
      "H' = 3.0 (scipy kruskal([1,1],[2,2]))") {
    // A {1,1}, B {2,2}: doubled midranks 3/3 and 7/7, R2 = 6/14,
    // H = 3·(36+196)/2/(10⁴·4·5)·10⁴ − 15 = 17.4 − 15 = 2.4;
    // T = 6+6 = 12, N³−N = 60 → corr 0.8 → H' = 3.0 mathematically —
    // but 17.4 is not binary-exact, the IEEE chain lands at
    // 2.9999999999999982, and 4dp FLOOR quantization (the gate's stated
    // contract: truncation, identical in both engines, never a rounding
    // boundary) reads it as 2.9999
    val dir = toyLake("orders" -> orders(Seq(
      ("O", "1-URGENT", 0.01), ("O", "1-URGENT", 0.01),
      ("O", "5-LOW", 0.02), ("O", "5-LOW", 0.02))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_kruskal_wallis")(spark, dir).collect()
      assert(got.length == 1)
      assert((got(0).getLong(1), got(0).getLong(2), got(0).getDouble(3)) ==
        ((4L, 2L, 2.9999)), s"got ${got(0)}")
    } finally cleanup(dir)
  }

  test("q_kruskal_wallis: an all-tied stratum (one distinct value) and a " +
      "one-group stratum are EXCLUDED, not divided by zero") {
    val dir = toyLake("orders" -> orders(Seq(
      // stratum P: every value identical → T = N³−N → excluded
      ("P", "1-URGENT", 0.05), ("P", "5-LOW", 0.05),
      // stratum Q: a single group → k = 1 → excluded
      ("Q", "2-HIGH", 0.01), ("Q", "2-HIGH", 0.02),
      // stratum R: a healthy two-group case survives
      ("R", "1-URGENT", 0.01), ("R", "5-LOW", 0.02))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_kruskal_wallis")(spark, dir).collect()
      assert(got.map(_.getString(0)).toSeq == Seq("R"), s"got ${got.toSeq}")
    } finally cleanup(dir)
  }

  test("q_label_prop: two triangles joined by a bridge resolve to two " +
      "communities of three under the (count desc, label asc) tie rule") {
    // traced by hand through all three synchronous rounds: the bridge
    // node 10 is pulled into {1,2,3}'s label briefly (round 2's 10→10 is
    // via its own triangle) and the final labels are {1,2,3}→1 and
    // {10,11,12}→3 — communities survive, the bridge does not merge them
    val dir = toyLake("lineitem" -> Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), // triangle {1,2,3}
      (2L, 10L), (2L, 11L), (2L, 12L), // triangle {10,11,12}
      (3L, 3L), (3L, 10L)) // bridge 3–10
      .toDF("l_orderkey", "l_partkey"))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_label_prop")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, 3L, 6L), (3L, 3L, 33L)), s"got $got")
    } finally cleanup(dir)
  }

  test("knn_mmr_rerank: hand-traced greedy — diversity outranks a " +
      "redundant higher-relevance candidate at every step") {
    // q0 = e1; candidates 10 = (.8,.6,0,0), 11 = (.6,.8,0,0) (near-dup of
    // 10: sim .96), 12 = (.6,0,−.8,0) (diverse: sim to 10 = .48); fillers
    // 1..4 = e2/e3/e4/−e1. Greedy at λ = ½ (integer rel4 − maxsim4):
    //   s1 = 10 (rel .8)
    //   s2: 11 → .6−.96 = −.36, 12 → .6−.48 = .12, e2/e3 → 0 … pick 12
    //   s3: tie at 0 between e3(id2)/e4(id3) → lowest id 2
    //   s4: 3 (0)   s5: 11 (−.36) — the near-dup enters LAST
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f), 3L -> Seq(0f, 0f, 0f, 1f),
      4L -> Seq(-1f, 0f, 0f, 0f),
      10L -> Seq(0.8f, 0.6f, 0f, 0f), 11L -> Seq(0.6f, 0.8f, 0f, 0f),
      12L -> Seq(0.6f, 0f, -0.8f, 0f))
    val dir = toyLake("embeddings" ->
      vecs.toDF("vec_id", "embedding"))
    try {
      val got = graft.queries.VectorQueries
        .queries("knn_mmr_rerank")(spark, dir)
        .filter(org.apache.spark.sql.functions.col("q_id") === 0L)
        .orderBy("rk").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, 10L), (2L, 12L), (3L, 2L), (4L, 3L), (5L, 11L)),
        s"got $got")
    } finally cleanup(dir)
  }

  test("q_seq_pattern: the greedy earliest-occurrence rule — gap " +
      "subsequences count, strict-ts means same-ts events cannot chain") {
    // user 1: A@1, B@2, C@3, A@4 → supports (A,B,C), (B,C,A)? B@2→C@3→A@4
    //   yes, (A,B,A)? A@1→B@2→A@4 yes; user 2: A@1, C@1 (same ts —
    //   cannot chain), B@5 → supports only pairs-with-B as the tail
    // ts rides the legacy long-nanos encoding: seconds apart so the
    // ns → µs normalization keeps them distinct
    val G = 1000000000L
    val dir = toyLake("events" -> Seq(
      (1L, 1L, "A", 1 * G), (2L, 1L, "B", 2 * G), (3L, 1L, "C", 3 * G),
      (4L, 1L, "A", 4 * G),
      (5L, 2L, "A", 1 * G), (6L, 2L, "C", 1 * G), (7L, 2L, "B", 5 * G))
      .toDF("event_id", "user_id", "event_type", "ts"))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_seq_pattern")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getLong(3)).toMap
      assert(got(("A", "B", "C")) == 1L)
      assert(got(("A", "B", "A")) == 1L, "gap subsequence via the later A")
      assert(got(("B", "C", "A")) == 1L)
      assert(!got.contains(("A", "C", "B")) || got(("A", "C", "B")) == 1L)
      // user 2's same-ts A/C cannot chain: (A,C,B) is supported only if
      // some user has A strictly before C strictly before B — user 1 has
      // A@1, C@3 but no B after 3; user 2's A@1/C@1 are simultaneous
      assert(!got.contains(("A", "C", "B")),
        s"same-ts events must not chain: $got")
    } finally cleanup(dir)
  }

  test("cdc_column_diff: only UPDATEs with a known before image count; " +
      "per-column changed/unchanged is exact") {
    // feed derives from events via ChangeFeed.fromEvents: lsn = event_id,
    // table = users/accounts by user_id parity, op by event_type, value
    // and props carried. user 2 (users): signup v=1.0 then update v=1.0
    // (props same) → UNCHANGED both columns; then update v=2.0 → value
    // changed. user 4 (users): update with NO prior → excluded.
    val dir = toyLake("events" -> Seq(
      (1L, 2L, "signup", 10L, 1.0, "p"),
      (2L, 2L, "click", 20L, 1.0, "p"), // update, nothing changed
      (3L, 2L, "click", 30L, 2.0, "p"), // update, value changed
      (4L, 4L, "click", 40L, 9.0, "x")) // update with no before: excluded
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props"))
    try {
      val got = graft.queries.CdcQueries
        .queries("cdc_column_diff")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(got(("users", "value")) == ((2L, 1L)), s"got $got")
      assert(got(("users", "props")) == ((2L, 0L)), s"got $got")
      assert(!got.contains(("accounts", "value")), "no accounts updates")
    } finally cleanup(dir)
  }

  test("pipeline_expectations: every rule's failure count is exact on a " +
      "lake with one planted violation per rule") {
    val dir = toyLake(
      "documents" -> Seq(
        (1L, "hello", "en", "web", 5L), // clean
        (1L, "dup id", "de", "web", 6L), // duplicate doc_id
        (2L, "bad count", "fr", "web", 99L), // n_chars mismatch
        (3L, "zh doc", "zh", "web", 6L), // out-of-contract lang
        (4L, "no source", "es", "", 9L)) // empty source
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      "events" -> Seq(
        (1L, 10L, "view", 5.0), // clean
        (2L, 10L, "click", -1.0), // non-positive value
        (3L, 999L, "view", 2.0)) // unknown user
        .toDF("event_id", "user_id", "event_type", "value"),
      "customer" -> Seq(Tuple1(10L)).toDF("c_custkey"))
    try {
      val got = graft.queries.PipelineQueries
        .queries("pipeline_expectations")(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
      assert(got("doc_id_not_null") == ((5L, 0L, true)))
      assert(got("doc_id_unique") == ((5L, 1L, false)))
      assert(got("n_chars_consistent") == ((5L, 1L, false)))
      assert(got("lang_in_contract") == ((5L, 1L, false)))
      assert(got("source_not_empty") == ((5L, 1L, false)))
      assert(got("value_positive") == ((3L, 1L, false)))
      assert(got("user_in_customer") == ((3L, 1L, false)))
    } finally cleanup(dir)
  }
}
