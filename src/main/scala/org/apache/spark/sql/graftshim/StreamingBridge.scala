package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** The one Spark-internal seam the V1 streaming-source contract needs
  * (the standard extension-library shim, in a sibling package of
  * `org.apache.spark.sql` because `Dataset.ofRows` is private[sql]):
  * MicroBatchExecution ASSERTS that a V1 `Source.getBatch` result has
  * `isStreaming = true` on its leaves, and Spark's own FileStreamSource
  * satisfies it exactly this way — re-tagging the batch-planned
  * `LogicalRelation` as streaming (FileStreamSource.getBatch builds
  * `LogicalRelation(relation, isStreaming = true)`). Nothing about the
  * scan changes: same files, same pushdown, same codegen — only the
  * plan's streaming bit, which is what lets the incremental parquet
  * scan ride inside a streaming query plan. */
object StreamingBridge {

  /** Re-tag `df`'s leaf relations as streaming — the FileStreamSource
    * getBatch move. Loud if the plan has no taggable leaf (a source
    * handing Spark a non-relation plan would violate the V1 contract
    * silently otherwise). */
  def asStreaming(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[ClassicDataset[Row]]
    var tagged = 0
    val plan = cds.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        tagged += 1; lr.copy(isStreaming = true)
      case loc: LocalRelation if !loc.isStreaming =>
        tagged += 1; loc.copy(isStreaming = true)
    }
    require(tagged > 0 || plan.isStreaming,
      s"cannot tag plan as streaming — no LogicalRelation/LocalRelation " +
        s"leaf in:\n${cds.queryExecution.analyzed}")
    ClassicDataset.ofRows(cds.sparkSession, plan)
  }

  /** A batch DataFrame over an analyzed logical plan — the
    * `Dataset.ofRows` seam the SQL MERGE interception needs (its
    * command re-plans the resolved USING subquery as the merge
    * source). */
  def dfOf(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    ClassicDataset.ofRows(s.asInstanceOf[ClassicSparkSession], plan)

  /** A Column over a catalyst Expression — `ExpressionUtils.column` is
    * private[sql]; the MERGE interception rebuilds action expressions
    * as Columns over TxLogMerge's joined frame through this seam. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** An empty STREAMING frame of `schema` — the no-new-data batch. */
  def emptyStreaming(s: SparkSession, schema: StructType): DataFrame =
    ClassicDataset.ofRows(s.asInstanceOf[ClassicSparkSession],
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil,
        isStreaming = true))
}
