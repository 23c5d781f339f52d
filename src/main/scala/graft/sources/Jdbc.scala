package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Initial-snapshot load over JDBC — the other half of replication.
  *
  * The reference captures changes from a given LSN onward
  * (postrack.go:285-309); a consumer bootstraps by (1) snapshotting the
  * table, (2) noting the slot's confirmed LSN, (3) applying the change
  * stream from that LSN via `cdc.Apply.upsert` / `streaming.CdcStream`.
  * This wrapper is step 1, Spark-native: numPartitions range-partitioned
  * parallel reads so a large table snapshot scales out instead of
  * single-streaming through one connection.
  *
  * Exercised for real against an embedded Derby database by the gated
  * `src_jdbc_roundtrip` key (write over JDBC, read back through the
  * range-partitioned snapshot, checksum vs the original lake); kept to
  * the thinnest possible delegation to `spark.read.jdbc` beyond that.
  */
object Jdbc {

  /** Range-partitioned snapshot read: `partitionCol` must be an indexed
    * numeric column (typically the PK that the CDC feed also keys on, so
    * the snapshot and the change stream share partitioning semantics). */
  def snapshot(
      spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Push a predicate set down as one-partition-per-predicate reads (the
    * JDBC analog of the reference's publication row condition). */
  def snapshotWhere(
      spark: SparkSession, url: String, table: String,
      predicates: Array[String],
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, predicates, props)
}
