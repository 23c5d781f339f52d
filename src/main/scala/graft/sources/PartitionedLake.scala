package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned lake layout — the storage shape a 100 TB fact table
  * actually uses. Writing `.partitionBy(dateCol)` gives every time-filtered
  * query partition PRUNING: the scan never opens files outside the
  * requested range (visible as PartitionFilters in the plan), which is the
  * difference between reading a day and reading the decade.
  */
object PartitionedLake {

  /** Write `df` hive-partitioned by a derived yyyy-MM-dd date column. */
  def writeByDay(df: DataFrame, tsUsCol: String, path: String): Unit =
    df.withColumn("day", date_format(timestamp_micros(col(tsUsCol)), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Read back with a day filter that prunes at the directory level. */
  def readDays(spark: SparkSession, path: String, from: String, to: String): DataFrame =
    spark.read.parquet(path).filter(col("day") >= from && col("day") <= to)
}
