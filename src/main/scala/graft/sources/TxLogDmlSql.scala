package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}

/** SQL `UPDATE` / `DELETE` for TxLog tables (r15 — VERDICT item 1: the
  * statements a user actually types, finishing the SQL front door):
  * Spark resolves [[DeleteFromTable]] / [[UpdateTable]] and then demands
  * `SupportsDelete` / row-level-operation machinery from the target;
  * instead, the same resolution-rule interception that carries MERGE
  * INTO ([[TxLogMergeSqlRule]]) rewrites both onto [[TxLogMerge.merge]]
  * — a DELETE is a merge whose source is the filtered target keys with
  * a delete-everything-matched clause, an UPDATE the same with the SET
  * list as the update clause — so SQL DML and the gated Scala verb
  * CANNOT drift, and both inherit deletion vectors (`graft.txlog.merge
  * .dvThreshold`), the change feed (`…changeFeed`), and bucket-granular
  * commit cost.
  *
  * KEYS: a merge needs the row-identity columns. A bucketed table
  * recorded them in its layout metadata (`__keys`, written by every
  * merge since r15) — DML recovers them from the log alone. A fresh
  * unbucketed table has no recorded identity: set
  * `graft.txlog.dml.keys` (comma-separated, order significant) for the
  * first statement; the bucketizing merge it compiles into records the
  * keys for every later statement. Both absent → LOUD with the remedy.
  *
  * LOUD unsupported shapes (never silently approximated): subqueries in
  * the WHERE condition or SET values (the merge evaluates them against
  * the joined frame, a different scope), and SET of a key column (the
  * merge guard — a row cannot move buckets). */
class TxLogDmlSqlRule(session: SparkSession) extends Rule[LogicalPlan] {

  @scala.annotation.tailrec
  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case d: DeleteFromTable if d.resolved => unwrap(d.table) match {
      case rel @ DataSourceV2Relation(t: TxLogTable, _, _, _, _, _) =>
        TxLogDmlCommand(t, rel.output, Some(d.condition), Nil, None)
      case _ => d
    }
    case u: UpdateTable if u.resolved => unwrap(u.table) match {
      case rel @ DataSourceV2Relation(t: TxLogTable, _, _, _, _, _) =>
        TxLogDmlCommand(t, rel.output, None, u.assignments, u.condition)
      case _ => u
    }
  }
}

/** The translated statement — `delete = Some(cond)` for DELETE,
  * `assignments` non-empty for UPDATE (`updateCond` its WHERE). */
case class TxLogDmlCommand(table: TxLogTable, targetOutput: Seq[Attribute],
    delete: Option[Expression], assignments: Seq[Assignment],
    updateCond: Option[Expression]) extends LeafRunnableCommand {

  private def verb: String = if (delete.isDefined) "DELETE FROM" else "UPDATE"

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$verb ${table.name()}: $what is not offered through SQL — run " +
        "graft.sources.TxLogMerge.merge for the full clause surface")

  override def run(spark: SparkSession): Seq[Row] = {
    val targetIds = targetOutput.map(_.exprId).toSet

    def rewrite(e: Expression): Column = {
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        unsupported(s"a subquery (${e.sql}) — the merge evaluates " +
          "conditions against the joined frame, a different scope; " +
          "materialize the subquery into a literal list first")
      org.apache.spark.sql.graftshim.StreamingBridge.columnOf(e.transform {
        case a: AttributeReference if targetIds(a.exprId) =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq(a.name))
      })
    }

    // --- row identity: the session conf wins, else the layout record ---
    val conf = spark.conf
    val keyCols: Seq[String] =
      conf.getOption("graft.txlog.dml.keys") match {
        case Some(ks) => ks.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None =>
          val recorded = TxLog.liveAdds(spark, table.table)
            .flatMap(_.part.get("__keys")).distinct
          recorded match {
            case Seq(ks) => ks.split(",").toSeq
            case Seq() => throw new IllegalArgumentException(
              s"$verb ${table.name()}: no row-identity keys — the table " +
                "is not merge-bucketed (no __keys layout record); set " +
                "graft.txlog.dml.keys = <col,col,…> for the first " +
                "statement (it establishes the layout)")
            case many => throw new IllegalArgumentException(
              s"$verb ${table.name()}: live dirs disagree on layout keys " +
                s"($many) — mixed layouts; set graft.txlog.dml.keys " +
                "explicitly or rebuild the table")
          }
      }

    // --- the true source: target rows the condition selects, one row
    // per key (the condition is ALSO re-evaluated as the merge clause's
    // own condition, so a duplicate-keyed table stays exact) ---
    val cond: Option[Column] =
      delete.map(rewrite).orElse(updateCond.map(rewrite))
    val target = TxLog.read(spark, table.table, table.schema())
    val source = cond.fold(target)(target.filter)
      .dropDuplicates(keyCols)

    val updateSet: Map[String, Column] = assignments.map { asg =>
      val name = asg.key match {
        case a: AttributeReference => a.name
        case other => unsupported(s"an assignment key ${other.sql}")
      }
      name -> rewrite(asg.value)
    }.toMap

    TxLogMerge.merge(spark, table.table, table.schema(), source, keyCols,
      updateSet = updateSet,
      updateWhen = if (updateSet.isEmpty) None else cond,
      deleteWhen = delete.map(rewrite),
      insertWhen = None,
      nBuckets = conf.getOption("graft.txlog.merge.nBuckets")
        .map(_.toInt).getOrElse(16),
      changeFeed = conf.getOption("graft.txlog.merge.changeFeed")
        .exists(_.toBoolean),
      dvThreshold = conf.getOption("graft.txlog.merge.dvThreshold")
        .map(_.toDouble).getOrElse(0.0))
    Seq.empty
  }
}
