package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory — the library's front door.
  *
  * Encodes the settings every graft workload wants so callers (and the
  * Verify/Bench mains) don't re-derive them:
  *  - shuffle partitions sized to the core count, not the 200 default
  *    (cluster deployments override per job: ~2-3× total cores);
  *  - AQE on with skew-join splitting and partition coalescing — the
  *    runtime re-plan layer the 100 TB design leans on;
  *  - nanosecond parquet timestamps read as longs (the capture feed's
  *    timestamp encoding, see sources.Tables);
  *  - UTC session timezone for engine-independent timestamp math.
  */
object GraftSession {

  def tune(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores.toString)
      // the library's SQL surface (native functions + the MERGE INTO
      // interception for TxLog tables) — a static conf, so it must ride
      // the builder that creates the context
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // reliable checkpoint files (Checkpointing.cut when a checkpoint dir
      // is configured) are only garbage-collected by the ContextCleaner
      // when this is on — default false would leak a dir per lineage cut
      // for the life of the deployment
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  /** Local session on `cores` threads (test/bench harnesses). */
  def local(cores: Int): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
