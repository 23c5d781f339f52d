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
