package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, not}

/** SQL `MERGE INTO` for TxLog tables (r14 — the front door's last leg):
  * Spark plans a resolved [[MergeIntoTable]] and then requires the
  * target to implement `SupportsRowLevelOperations`; instead of that
  * machinery (a full delta-rewrite planner), this is the Delta-style
  * interception — a post-hoc resolution rule (injected by
  * [[graft.GraftExtensions]]) rewrites a resolved MergeIntoTable whose
  * target is a [[TxLogTable]] into a runnable command that translates
  * the actions onto [[TxLogMerge.merge]], the already-gated verb, so
  * the SQL and Scala merge paths CANNOT drift.
  *
  * Supported shape (the standard MERGE; anything else is LOUD with the
  * Scala-verb remedy, never silently approximated):
  *  - ON: a conjunction of `t.k = s.k` / `t.k <=> s.k` same-name pairs
  *    (the equi-key contract bucket layout needs);
  *  - WHEN MATCHED: at most one DELETE and one UPDATE, any conditions,
  *    in either order (order compiles into the conditions: TxLogMerge
  *    evaluates delete-first, so `UPDATE cond … DELETE dcond` becomes
  *    `deleteWhen = dcond ∧ ¬cond`);
  *  - WHEN NOT MATCHED: one INSERT whose assignments are the identity
  *    projection (`c = s.c` per target column — TxLogMerge's insert
  *    projects the source by name), any condition;
  *  - WHEN NOT MATCHED BY SOURCE: not offered (TxLogMerge carries
  *    unmatched target rows — the MERGE default).
  *
  * Knobs ride session confs (`graft.txlog.merge.nBuckets`,
  * `.dvThreshold`, `.changeFeed`) — the same parameters the Scala verb
  * takes, so SQL merges get deletion vectors and the change feed too. */
class TxLogMergeSqlRule(session: SparkSession) extends Rule[LogicalPlan] {

  /** The target rides under the `AS` alias — strip to the relation. */
  @scala.annotation.tailrec
  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case m: MergeIntoTable if m.resolved => unwrap(m.targetTable) match {
      case rel @ DataSourceV2Relation(t: TxLogTable, _, _, _, _, _) =>
        TxLogMergeCommand(t, rel.output, m.sourceTable, m.mergeCondition,
          m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions)
      case _ => m
    }
  }
}

/** The translated merge, executed eagerly like every SQL command. */
case class TxLogMergeCommand(table: TxLogTable,
    targetOutput: Seq[Attribute], source: LogicalPlan,
    condition: Expression, matched: Seq[MergeAction],
    notMatched: Seq[MergeAction], notMatchedBySource: Seq[MergeAction])
    extends LeafRunnableCommand {

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO ${table.name()}: $what is not offered through SQL — " +
        "run graft.sources.TxLogMerge.merge for the full clause surface")

  override def run(spark: SparkSession): Seq[Row] = {
    val targetIds = targetOutput.map(_.exprId).toSet
    val sourceIds = source.output.map(_.exprId).toSet
    val fieldNames = table.schema().fields.map(_.name).toSeq

    // --- the ON clause → key columns -----------------------------------
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyCols = conjuncts(condition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
      case EqualNullSafe(a: AttributeReference, b: AttributeReference) =>
        (a, b)
      case other => unsupported(
        s"a non-equi ON conjunct (${other.sql})")
    }.map { case (a, b) =>
      val (t, s2) =
        if (targetIds(a.exprId) && sourceIds(b.exprId)) (a, b)
        else if (targetIds(b.exprId) && sourceIds(a.exprId)) (b, a)
        else unsupported(s"an ON conjunct not of the t.k = s.k shape " +
          s"(${a.sql} = ${b.sql})")
      if (t.name != s2.name) unsupported(
        s"an ON pair with differing names (${t.name} vs ${s2.name}) — " +
          "alias the source column to the target's name")
      t.name
    }

    // --- expression → Column over TxLogMerge's joined frame -------------
    // target attributes resolve by their own name, source attributes by
    // the __src_ prefix (the TxLogMerge contract)
    def rewrite(e: Expression): Column = org.apache.spark.sql.graftshim
      .StreamingBridge.columnOf(e.transform {
      case a: AttributeReference if targetIds(a.exprId) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(a.name))
      case a: AttributeReference if sourceIds(a.exprId) =>
        if (!fieldNames.contains(a.name)) unsupported(
          s"a source column '${a.name}' outside the target schema — " +
            "alias it to a target column name in the USING subquery")
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(s"${TxLogMerge.Src}${a.name}"))
    })

    // --- matched actions -------------------------------------------------
    val updates = matched.collect { case u: UpdateAction => u }
    val deletes = matched.collect { case d: DeleteAction => d }
    if (updates.size > 1 || deletes.size > 1 ||
        updates.size + deletes.size != matched.size)
      unsupported(s"this WHEN MATCHED clause list (${matched.size} " +
        "actions; at most one UPDATE and one DELETE)")
    val updateSet: Map[String, Column] = updates.headOption.map(_.assignments
      .map { asg =>
        val name = asg.key match {
          case a: AttributeReference => a.name
          case other => unsupported(s"an assignment key ${other.sql}")
        }
        name -> rewrite(asg.value)
      }.toMap).getOrElse(Map.empty)
    val updCond = updates.headOption.flatMap(_.condition).map(rewrite)
    val delCond = deletes.headOption.map { d =>
      val own = d.condition.map(rewrite).getOrElse(lit(true))
      // SQL evaluates matched actions in listed order; TxLogMerge
      // evaluates delete-first — an UPDATE listed BEFORE the DELETE
      // shields it, so the shield compiles into the delete condition
      val updateFirst = matched.headOption.exists(_.isInstanceOf[UpdateAction])
      if (updateFirst && updates.nonEmpty)
        own && not(coalesce(updCond.getOrElse(lit(true)), lit(false)))
      else own
    }

    // --- not-matched insert ----------------------------------------------
    if (notMatchedBySource.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE")
    val insCond: Option[Column] = notMatched match {
      case Nil => None
      case Seq(i: InsertAction) =>
        i.assignments.foreach { asg =>
          val ok = (asg.key, asg.value) match {
            case (k: AttributeReference, v: AttributeReference) =>
              sourceIds(v.exprId) && k.name == v.name
            case _ => false
          }
          if (!ok) unsupported(
            s"a non-identity INSERT assignment (${asg.key.sql} = " +
              s"${asg.value.sql}) — TxLogMerge inserts project the " +
              "source by name; compute the value in the USING subquery")
        }
        Some(i.condition.map(rewrite).getOrElse(lit(true)))
      case other => unsupported(s"${other.size} WHEN NOT MATCHED actions")
    }

    val conf = spark.conf
    val sourceDf = org.apache.spark.sql.graftshim.StreamingBridge
      .dfOf(spark, source)
    TxLogMerge.merge(spark, table.table, table.schema(), sourceDf,
      keyCols,
      updateSet = updateSet,
      updateWhen = updCond,
      deleteWhen = delCond,
      insertWhen = insCond,
      nBuckets = conf.getOption("graft.txlog.merge.nBuckets")
        .map(_.toInt).getOrElse(16),
      changeFeed = conf.getOption("graft.txlog.merge.changeFeed")
        .exists(_.toBoolean),
      dvThreshold = conf.getOption("graft.txlog.merge.dvThreshold")
        .map(_.toDouble).getOrElse(0.0))
    Seq.empty
  }
}
