package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's per-table registration (RelationMessage handling,
  * postrack.go:364-371) as a plain schema registry: one named parquet table
  * per relation, loaded lazily so Catalyst sees the scan and can push
  * filters/projections into it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores INT64 TIMESTAMP(NANOS) which Spark's vectorized
      // parquet reader rejects; read it as raw nanosecond longs instead.
      // Runtime-settable legacy conf, so this works even on a driver-provided
      // session. Queries derive micro/milli/timestamp views from the long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Table spread across all cores. The test tables are single small parquet
    * files (< spark.sql.files.maxPartitionBytes), so Spark scans them as ONE
    * partition; any compute-heavy map stage (signatures, decode) would run
    * on a single core. At 100 TB the input arrives pre-split, so this
    * repartition models that; locally it is required for parallelism. */
  def sharded(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
