package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LocalRelation, LogicalPlan, Project, Sort, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Automated plan audit over EVERY gated query — the r3 anti-pattern class
  * (single-reducer stratum windows) and the classic scale-killers
  * (cartesian/nested-loop joins over two unbounded sides), pinned
  * permanently so neither can regress.
  *
  * Rules, per query plan at sf0.001:
  *  1. a join with NO equi-key (cartesian / pure-theta — planned as
  *     CartesianProduct or BroadcastNestedLoopJoin) must have at least one
  *     side bounded by construction: an aggregated subtree (global 1-row
  *     aggs like corpus totals, or O(groups) per-group tables) or a plan
  *     literal (LocalRelation — driver-held centroids/codebooks). The ANN
  *     query-sample baselines, whose bounded side is a sampled Filter
  *     instead, are listed by name;
  *  2. every logical Window either partitions on a per-key column family
  *     (doc/pk/cluster/content-hash/... — group size bounded by the key's
  *     fan-in, not the corpus), or is one of the two audited two-level
  *     shapes (boundary-bucket rank gated by a `__b` filter; offsets scan
  *     over a `__psum`/`__pmax` partials table), or runs over an already
  *     aggregated table (months, stages — O(groups) rows). Stratum-only
  *     partition specs (source/table_name/...) over raw rows are exactly
  *     the r3 single-reducer sort and fail the build.
  */
class PlanLintSpec extends AnyFunSuite with SparkTestBase {

  // per-key families: group size is the key's fan-in (docs per id, rows per
  // order, members per cluster, copies per content hash...), independent of
  // corpus row count. "text" covers content-hash partition expressions
  // (md5(text) groups = duplicate multiplicity).
  private val perKeyCols = Set(
    "doc_id", "doc_a", "doc_b", "pk", "canonical", "cluster", "user_id",
    "vec_id", "q_id", "query_id", "media_id", "o_orderkey", "l_orderkey",
    "o_custkey", "c_custkey", "s_suppkey", "p_partkey", "l_suppkey",
    "l_partkey", "relation_id", "token", "gram", "span_h", "bucket",
    "band", "month", "window", "session_id", "shard", "__b", "__pid",
    "centroid", "cell", "text")
  // NOTE r8: "term" was REMOVED from the per-key family — a term's fan-in
  // is NOT bounded by a key's multiplicity; it grows with the corpus (a
  // stopword appears in ~every document), so a term-partitioned window is
  // the single-reducer class in disguise (the r7 text_tfidf df-window).

  /** Queries whose loop join's bounded side is a query SAMPLE (a literal-
    * bounded Filter, not an aggregate — invisible to the structural rule). */
  private val sampledLoopJoins = Set("knn_bruteforce", "knn_lsh", "knn_pq", "knn_ivf",
    "knn_recall_audit", "knn_range_search", "knn_range_audit",
    "emb_hard_negatives",
    // per-source signature table: O(sources) rows by construction, but the
    // memoized artifact is lineage-cut (LogicalRDD) so the aggregate that
    // bounds it is invisible to the structural rule
    "dedup_source_sigs")

  /** Queries whose cumulative window runs over a LINEAGE-CUT aggregated
    * table (the r8 branch-fed lineage-cut rule): the cut replaces the
    * bounding Aggregate with a LogicalRDD, making it invisible to the
    * structural rule — like `dedup_source_sigs` for the loop-join rule.
    * Both tables are O(groups × distinct-values/buckets), not corpus rows. */
  private val cutAggWindows =
    Set("q_skyline",
      // r11 integer-cents rank-math percentiles: every cumulative window
      // runs directly over the cut O(groups × distinct prices) histogram
      // (q_approx_percentiles / q_weighted_percentile left this set in
      // r15: single-consumer since the max-cum totals change, their
      // histograms are plain uncut Aggregates the structural rule sees)
      "q_percentiles", "q_sampled_percentiles", "q_mad")

  /** True when `p` IS a lineage-cut artifact modulo row-shape-preserving
    * unary nodes (Project/Filter/Sort): the window's direct bounded input,
    * not merely "some checkpointed RDD exists somewhere below" — a corpus
    * window whose subtree happens to contain a cut artifact (e.g. under a
    * join) must NOT inherit the exemption (the r8 ADVICE tightening). */
  @annotation.tailrec
  private def unwrapsToCutArtifact(p: LogicalPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.LogicalRDD => true
    case proj: Project => unwrapsToCutArtifact(proj.child)
    case f: Filter => unwrapsToCutArtifact(f.child)
    case srt: Sort => unwrapsToCutArtifact(srt.child)
    // a Window is row-shape-preserving too (adds columns, never rows):
    // since r15 the rank-math percentiles stack a max-cum total window on
    // the SAME partitioning as the cumsum window (guide §2.4 — ride one
    // exchange instead of re-aggregating + joining back), so the second
    // window's direct input is Window-over-cut-artifact — still exactly
    // the audited bounded shape the exemption was added for
    case w: LWindow => unwrapsToCutArtifact(w.child)
    case _ => false
  }

  private def hasBoundedSubtree(p: LogicalPlan): Boolean = p.collectFirst {
    case _: Aggregate => ()
    case _: LocalRelation => ()
  }.nonEmpty

  private def hasEquiKey(j: Join): Boolean = j.condition.exists(_.exists {
    case _: EqualTo | _: EqualNullSafe => true
    case _ => false
  })

  /** A window partition attribute's names: itself PLUS base columns
    * resolved through child Project aliases (`_w0` = md5(text) → {text}) —
    * union, not replacement, so a genuine `doc_id` stays recognizable even
    * when some child Project re-aliases it from a tuple field. */
  private def baseNames(w: LWindow, name: String): Set[String] = {
    val aliases = w.child.collect { case p: Project =>
      p.projectList.collect { case a: Alias => a.name -> a.child.references.map(_.name).toSet }
    }.flatten.toMap
    aliases.getOrElse(name, Set.empty) + name
  }

  private def windowOk(w: LWindow): Boolean = {
    val parts = w.partitionSpec.flatMap(_.references.map(_.name))
      .flatMap(n => baseNames(w, n)).toSet
    def childHas(p: PartialFunction[LogicalPlan, Boolean]): Boolean =
      w.child.collectFirst(p).getOrElse(false)
    val boundaryGated = childHas {
      case f: Filter => f.condition.references.exists(_.name == "__b") }
    val overPartials = childHas {
      case a: Aggregate => a.aggregateExpressions.exists(e =>
        e.toString.contains("__psum") || e.toString.contains("__pmax")) }
    val overAggregate = childHas { case _: Aggregate => true }
    if (parts.exists(perKeyCols)) true // any per-key column bounds the group
    else if (boundaryGated || overPartials) true // audited two-level shapes
    // stratum-only or global window: bounded only over an aggregated table
    else overAggregate
  }

  for ((name, build) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"plan lint: $name") {
      val df = build(spark, sf)
      val plan = df.queryExecution.optimizedPlan
      if (!sampledLoopJoins(name)) {
        plan.foreach {
          case j: Join if !hasEquiKey(j) =>
            assert(hasBoundedSubtree(j.left) || hasBoundedSubtree(j.right),
              s"$name plans a loop join with no bounded side:\n$j")
          case _ => ()
        }
      }
      plan.collect { case w: LWindow => w }.foreach { w =>
        // the exemption is scoped to the specific shape it was added for
        // (a window whose bounding Aggregate was lineage-cut to a
        // LogicalRDD, sitting DIRECTLY under the window) — a corpus-row
        // window in the same query whose subtree merely contains a cut
        // artifact must still fail
        val overCutArtifact = cutAggWindows(name) && unwrapsToCutArtifact(w.child)
        assert(windowOk(w) || overCutArtifact,
          s"$name window partitions only on strata columns with an " +
            s"unbounded child — the single-reducer sort class:\n$w")
      }
    }
  }

  test("text_tfidf: df is a combined aggregate + join, never a per-term window") {
    // the VERDICT-r7 skew exposure: count() over (partition by term) lands
    // a stopword's full posting list on one task with no combine and no
    // AQE split. The fix — groupBy(term) partials joined back — must stay:
    // no Window at all in this plan except the per-doc top-3 rank.
    val plan = SparkEntry.queries("text_tfidf")(spark, sf)
      .queryExecution.optimizedPlan
    val termWindows = plan.collect {
      case w: LWindow if w.partitionSpec.flatMap(_.references.map(_.name))
        .exists(_ == "term") => w
    }
    assert(termWindows.isEmpty,
      s"text_tfidf must not partition a window by term (posting-list skew):\n${termWindows.headOption}")
    // and the df aggregate is present (a groupBy(term) under a join)
    val termAggs = plan.collect {
      case a: Aggregate if a.groupingExpressions.flatMap(_.references.map(_.name)) == Seq("term") => a
    }
    assert(termAggs.nonEmpty, "text_tfidf df must be a groupBy(term) aggregate")
  }

  test("lsh audit posture: the DEFAULT operator path is the stratum-filtered join") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    def semiJoins(name: String): Int =
      SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
        .collect { case j: Join if j.joinType == LeftSemi => j }.size
    // Dedup.lshAudit without fullCorpus=true must gate BOTH pair endpoints
    // and the exact side's gram input through the stratum semi-join — three
    // LeftSemi joins — so the quadratic exact join never sees the full
    // corpus unless explicitly asked to
    assert(semiJoins("dedup_lsh_audit_sampled") >= 3,
      "sampled audit must stratum-filter est pairs (both endpoints) and exact grams")
    // and the opt-in full form has no hidden STRATUM gate: no md5-prefix
    // filter anywhere in its plan. (It does carry LeftSemi joins since r7 —
    // the gram-keyed verify's intersection join — so "zero semi joins" is
    // no longer the right proxy; the md5 content-hash filter is what a
    // sampling gate actually looks like.)
    val fullPlan = SparkEntry.queries("dedup_lsh_audit")(spark, sf)
      .queryExecution.optimizedPlan
    val md5Gates = fullPlan.collect {
      case f: Filter if f.condition.find(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Md5]).isDefined => f
    }
    assert(md5Gates.isEmpty,
      "full audit is the explicit fullCorpus=true opt-in; no hidden stratum sampling")
  }
}
