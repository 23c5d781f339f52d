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

  override def apply(ext: SparkSessionExtensions): Unit =
    graft.plans.NativeFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
