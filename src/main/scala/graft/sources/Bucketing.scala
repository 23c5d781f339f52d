package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the storage-level answer to repeated large-scale
  * equi-joins/aggregations on the same key. Writing both sides bucketed (and
  * sorted) by the join key lets Spark plan a sort-merge join with NO
  * exchange on either side — at 100 TB that is the difference between a
  * one-off shuffle per query and none.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. Drops any previous
    * incarnation first — a stale warehouse directory without a metastore
    * entry (e.g. after a metastore reset) would otherwise fail the write
    * with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.foreach(rm)
      f.delete(); ()
    }
    if (loc.exists) rm(loc)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucketing key — shuffle-free when
    * bucket counts line up. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
