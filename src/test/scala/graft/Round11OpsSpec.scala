package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-input specs for the round-11 statistics/graph additions: the
  * two-sample KS statistic on separated vs identical distributions, the
  * Mann–Whitney U against a hand-computed tied-rank reference, and the
  * triangle census on hand-built graphs (including the duplicate-edge
  * collapse and the exactly-once orientation closure). Each test writes a
  * crafted lake and drives the REAL gate plan — no reimplementation of
  * the query under test.
  */
class Round11OpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def toyLake(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("r11-lake").toString
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  private def cleanup(dir: String): Unit =
    graft.operators.Checkpointing.deleteRecursively(dir)

  private def orders(rows: Seq[(String, String, Double)]): DataFrame =
    rows.toDF("o_orderstatus", "o_orderpriority", "o_totalprice")

  test("q_ks_test: perfectly separated samples give D = 1, identical " +
      "samples give D = 0, exact numerators throughout") {
    // status F: high {0.01, 0.02} strictly below low {0.03, 0.04} → D = 1
    //   (d_num = n1·n2 = 4); status O: both groups {0.01, 0.03} → D = 0
    val dir = toyLake("orders" -> orders(Seq(
      ("F", "1-URGENT", 0.01), ("F", "2-HIGH", 0.02),
      ("F", "3-MEDIUM", 0.03), ("F", "5-LOW", 0.04),
      ("O", "1-URGENT", 0.01), ("O", "1-URGENT", 0.03),
      ("O", "4-NOT SPECIFIED", 0.01), ("O", "5-LOW", 0.03))))
    try {
      val got = graft.queries.RelationalQueries.queries("q_ks_test")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(got("F") == ((2L, 2L, 4L, 1.0)), s"got ${got("F")}")
      assert(got("O") == ((2L, 2L, 0L, 0.0)), s"got ${got("O")}")
    } finally cleanup(dir)
  }

  test("q_mann_whitney: hand-computed tied-rank U and tie-corrected z") {
    // high {1, 2} vs low {2, 3} cents: pooled ranks 1, 2.5, 2.5, 4 →
    // R1 = 3.5, 2U1 = 2·3.5 − n1(n1+1) = 1; ties Σ(t³−t) = 6 →
    // σ² = (4/12)·((4+1) − 6/(4·3)) = 1.5, z = (0.5 − 2)/√1.5 =
    // −1.22474… → floor-quantized −1.2248
    val dir = toyLake("orders" -> orders(Seq(
      ("F", "1-URGENT", 0.01), ("F", "2-HIGH", 0.02),
      ("F", "3-MEDIUM", 0.02), ("F", "5-LOW", 0.03))))
    try {
      val r = graft.queries.RelationalQueries
        .queries("q_mann_whitney")(spark, dir).collect()
      assert(r.length == 1)
      assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
        r(0).getDouble(4)) == ((2L, 2L, 1L, -1.2248)), s"got ${r(0)}")
    } finally cleanup(dir)
  }

  test("q_mann_whitney: an all-tied stratum (zero variance) is excluded " +
      "by the exact integer guard, never a NaN") {
    val dir = toyLake("orders" -> orders(Seq(
      ("P", "1-URGENT", 0.05), ("P", "5-LOW", 0.05),
      ("F", "1-URGENT", 0.01), ("F", "5-LOW", 0.02))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_mann_whitney")(spark, dir)
        .collect().map(_.getString(0)).toSet
      assert(got == Set("F"), s"got $got")
    } finally cleanup(dir)
  }

  private def lineitems(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("l_orderkey", "l_partkey")

  test("q_kendall_tau: hand-computed concordance — monotone gives +1, " +
      "balanced ties give 0, a constant variable is excluded") {
    // A: (1,1),(2,2),(3,3) → C=3, D=0, no ties → τ = 1
    // B: (1,1),(1,2),(2,1),(2,2) → C=1, D=1, dx=dy=8 → τ = 0
    // C: constant quantity → dx = 0 → excluded by the integer guard
    val li = Seq(
      ("A", 1.0, 0.01), ("A", 2.0, 0.02), ("A", 3.0, 0.03),
      ("B", 1.0, 0.01), ("B", 1.0, 0.02), ("B", 2.0, 0.01),
      ("B", 2.0, 0.02),
      ("C", 5.0, 0.01), ("C", 5.0, 0.02))
      .toDF("l_returnflag", "l_quantity", "l_discount")
    val dir = toyLake("lineitem" -> li)
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_kendall_tau")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(got.keySet == Set("A", "B"), s"got $got")
      assert(got("A") == ((3L, 3L, 0L, 1.0)), s"got ${got("A")}")
      assert(got("B") == ((4L, 1L, 1L, 0.0)), s"got ${got("B")}")
    } finally cleanup(dir)
  }

  test("q_triangle_count: triangle + pendant edge, duplicate co-purchases " +
      "collapse to one edge") {
    // order 1 buys parts {1,2,3} (a triangle), order 2 buys {3,4} (a
    // pendant), order 3 re-buys {1,2} (must NOT add a second edge; two
    // lines of part 1 in one order must not self-pair).
    // Graph: edges {1-2, 1-3, 2-3, 3-4}; degrees 2,2,3,1 →
    // wedges = 1+1+3+0 = 5, triangles = 1, gcc = 3/5 = 0.6
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L))))
    try {
      val r = graft.queries.RelationalQueries
        .queries("q_triangle_count")(spark, dir).collect()
      assert(r.length == 1)
      assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
        r(0).getLong(3), r(0).getDouble(4)) == ((4L, 4L, 5L, 1L, 0.6)),
        s"got ${r(0)}")
    } finally cleanup(dir)
  }

  test("q_bfs_reach: levels walk the path exactly one hop per round; " +
      "beyond-horizon and disconnected nodes report as unreached") {
    // path 1-2-3-4-5 (each edge via one order) + separate component 6-7:
    // seed = 1 → l0={1}, l1={2}, l2={3}, l3={4}; unreached = {5, 6, 7}
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (1L, 2L),
      (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L),
      (4L, 4L), (4L, 5L),
      (5L, 6L), (5L, 7L))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_bfs_reach")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == Seq((-1L, 3L, 18L), (0L, 1L, 1L), (1L, 1L, 2L),
        (2L, 1L, 3L), (3L, 1L, 4L)), s"got $got")
    } finally cleanup(dir)
  }

  test("q_link_predict: hand-computed per-seed common-neighbor recs; " +
      "existing edges are excluded even with shared neighbors") {
    // edges: 1-2, 1-3, 1-4, 2-3, 3-5, 4-5 (one order each); all 5 nodes
    // are seeds (≤ 100). Per seed (count desc, cand):
    //   1 → 5 via {3,4} (2); 3-adj and 2-adj candidates excluded
    //   2 → 4 via {1} (1), 5 via {3} (1)    [2-3 IS an edge → no 3]
    //   3 → 4 via {1,5} (2)
    //   4 → 3 via {1,5} (2), 2 via {1} (1)
    //   5 → 1 via {3,4} (2), 2 via {3} (1)
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 2L), (4L, 3L), (5L, 3L), (5L, 5L), (6L, 4L), (6L, 5L))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_link_predict")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == Seq(
        (1L, 5L, 2L, 1L),
        (2L, 4L, 1L, 1L), (2L, 5L, 1L, 2L),
        (3L, 4L, 2L, 1L),
        (4L, 3L, 2L, 1L), (4L, 2L, 1L, 2L),
        (5L, 1L, 2L, 1L), (5L, 2L, 1L, 2L)), s"got $got")
    } finally cleanup(dir)
  }

  test("q_anova: hand-computed two-group decomposition — SSB 40000, " +
      "SSW 10000 cents-squared, F = 8") {
    // A: $1.00, $2.00; B: $3.00, $4.00 → group means 150/350 cents,
    // grand 250 → SSB = 2·100² + 2·100² = 40000, SSW = 4·50² = 10000,
    // F = (40000/1)/(10000/2) = 8
    val dir = toyLake("orders" -> Seq(
      ("1-URGENT", 1.00), ("1-URGENT", 2.00),
      ("5-LOW", 3.00), ("5-LOW", 4.00))
      .toDF("o_orderpriority", "o_totalprice"))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_anova")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(1),
          r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
      assert(got("1-URGENT") ==
        ((2L, 1.5, 2L, 4L, 40000.0, 10000.0, 8.0)), s"got $got")
      assert(got("5-LOW") ==
        ((2L, 3.5, 2L, 4L, 40000.0, 10000.0, 8.0)), s"got $got")
    } finally cleanup(dir)
  }

  test("q_bfs_reach: an unreached node counts ONCE regardless of its " +
      "degree (union-all vs distinct regression)") {
    // path 1-2 reached; disconnected TRIANGLE {6,7,8} — every unreached
    // node has degree 2, so a union-all node list would report 6 nodes
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (1L, 2L),
      (5L, 6L), (5L, 7L), (5L, 8L))))
    try {
      val got = graft.queries.RelationalQueries
        .queries("q_bfs_reach")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == Seq((-1L, 3L, 21L), (0L, 1L, 1L), (1L, 1L, 2L)),
        s"got $got")
    } finally cleanup(dir)
  }

  test("q_bfs_reach: an empty co-purchase graph (single-part orders) " +
      "reports empty, never NPE or a phantom null level") {
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (2L, 2L), (3L, 3L))))
    try {
      assert(graft.queries.RelationalQueries
        .queries("q_bfs_reach")(spark, dir).collect().isEmpty)
    } finally cleanup(dir)
  }

  test("q_triangle_count: K4 closes every wedge exactly once — 4 " +
      "triangles, never 12 or 24") {
    // one order with parts {1,2,3,4} (K4) plus a pendant order {4,5}:
    // degrees 3,3,3,4,1 → wedges = 3+3+3+6+0 = 15, edges = 7,
    // triangles = C(4,3) = 4, gcc = 12/15 = 0.8
    val dir = toyLake("lineitem" -> lineitems(Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 4L), (2L, 5L))))
    try {
      val r = graft.queries.RelationalQueries
        .queries("q_triangle_count")(spark, dir).collect()
      assert(r.length == 1)
      assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
        r(0).getLong(3), r(0).getDouble(4)) == ((5L, 7L, 15L, 4L, 0.8)),
        s"got ${r(0)}")
    } finally cleanup(dir)
  }
}
