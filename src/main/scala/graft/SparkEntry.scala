package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++
      RelationalQueries.queries ++
      BehaviorQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      VectorQueries.queries ++
      MultimodalQueries.queries ++
      PipelineQueries.queries ++
      SourceQueries.queries

  /** DuckDB-equivalent SQL per query key (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++
      RelationalQueries.oracles ++
      BehaviorQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      VectorQueries.oracles ++
      MultimodalQueries.oracles ++
      PipelineQueries.oracles ++
      SourceQueries.oracles
}
