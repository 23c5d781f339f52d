package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    // Pin the session settings every query's oracle parity depends on.
    // Deliberately session-global and sticky (both are runtime-settable, so
    // this also fixes up driver-provided sessions, cf. GraftSession):
    //  - UTC: timestamp literals / date_format must not shift with the
    //    host timezone or every date-filtered oracle diverges;
    //  - nanosAsLong: events.parquet stores INT64 TIMESTAMP(NANOS), which
    //    the vectorized reader otherwise rejects — queries derive
    //    micro/milli/timestamp views from the raw long.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table's `ts` → microseconds-since-epoch LONG, robust to the
    * lake's physical timestamp encoding (the driver has shipped both):
    * INT64 TIMESTAMP(NANOS) reads raw as longs under nanosAsLong → floor
    * div 1000 (floor, not `div`, so pre-epoch nanos round the same way the
    * unix_micros branches do); TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * reads as TIMESTAMP_NTZ → cast under a UTC session preserves the stored
    * wall-clock value, so unix_micros equals the oracle's epoch_us(ts)
    * exactly. The NTZ branch is only correct under a UTC session timezone;
    * rather than silently repinning it (a surprising global side effect from
    * a pure-looking column builder), fail loudly if a caller unpinned the
    * session after `Tables.apply`/`GraftSession` set it. */
  def tsMicros(df: DataFrame): Column = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"tsMicros requires spark.sql.session.timeZone=UTC (found '$tz'): the " +
        "TIMESTAMP_NTZ cast shifts with the session zone and would diverge " +
        "from the oracle's epoch_us(ts). GraftSession.local and Tables.apply " +
        "pin UTC; restore it before deriving event timestamps.")
    df.schema("ts").dataType match {
      // ts div 1000 truncates toward zero; subtract 1 when a negative value
      // has a remainder so the result is floor(ts / 1000) without the
      // precision loss of a double-typed division at ~1e18 nanos.
      case LongType =>
        expr("ts div 1000 + (CASE WHEN ts < 0 AND ts % 1000 != 0 THEN -1 ELSE 0 END)")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
  }

  /** Table spread across all cores. The test tables are single small parquet
    * files (< spark.sql.files.maxPartitionBytes), so Spark scans them as ONE
    * partition; any compute-heavy map stage (signatures, decode) would run
    * on a single core. At 100 TB the input arrives pre-split, so this
    * repartition models that; locally it is required for parallelism. */
  def sharded(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
