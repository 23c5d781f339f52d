package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven entry point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) injects
  * every native function in [[graft.plans.NativeFunctions.all]] at session
  * build time, so pure-SQL deployments (thrift server, notebooks,
  * spark-submit jobs that never import the library) can call
  * `ngram_minhash_md5(...)`, `cosine_sim(...)`, `topk(...)` etc. directly.
  * The builders are the same objects the Column wrappers register, so the
  * two routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.plans.NativeFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // SQL MERGE INTO over TxLog tables: a resolved MergeIntoTable whose
    // target is a TxLogTable rewrites onto the gated Scala merge verb
    // (the Delta-style interception — see sources/TxLogMergeSql.scala)
    // injected into the RESOLUTION fixed point (not post-hoc): Spark's
    // own RewriteMergeIntoTable throws table-operation-unsupported for
    // non-row-level tables as soon as the merge is resolved, so the
    // interception must win inside the same fixed point
    ext.injectResolutionRule(s =>
      new graft.sources.TxLogMergeSqlRule(s))
    // SQL UPDATE / DELETE over TxLog tables (r15): the same interception
    // shape, compiling both statements onto the gated merge verb (a
    // DELETE is a merge of the filtered target keys with a delete
    // clause; an UPDATE the same with the SET list) — see
    // sources/TxLogDmlSql.scala
    ext.injectResolutionRule(s =>
      new graft.sources.TxLogDmlSqlRule(s))
  }
}
