package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the storage-level answer to repeated large-scale
  * equi-joins/aggregations on the same key. Writing both sides bucketed (and
  * sorted) by the join key lets Spark plan a sort-merge join with NO
  * exchange on either side — at 100 TB that is the difference between a
  * one-off shuffle per query and none.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucketing key — shuffle-free when
    * bucket counts line up. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
