package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

/** Shared driver for the oracle-gated STREAMING-ENGINE runs
  * (cdc_stream_snapshot, cdc_maintained_agg, q_kmv_stream,
  * q_zscore_stream, q_transitions_stream, q_attribution_stream): drive a
  * streaming Dataset into a per-run parquet FILE sink (foreachBatch —
  * driver footprint O(1) in the emission count; the sink is never a
  * driver-memory table), drain it synchronously, hand the sink files to
  * the caller's extractor as a DataFrame, and ALWAYS — on success or
  * failure — delete the per-run sink/checkpoint/state-store tree. One
  * definition, because the cleanup rule (a failed drain must not leak a
  * sink or state tree in /tmp) and the conf-pin rule (the stream thread
  * captures spark.sql.shuffle.partitions asynchronously after start(), so
  * the session conf must stay pinned through the whole synchronous drain)
  * are too easy to drift across call-site clones.
  *
  * State partitioning is pinned to 8 for the drain: a streaming query
  * freezes numShufflePartitions into its checkpoint at start, and that
  * count sizes the state stores (files + commits per micro-batch per
  * stateful operator). 32 is right for the batch suite but pays ~4× the
  * state-store churn for O(keys)-state gates; partitioning never changes
  * results. The conf is restored after the drain — batch queries read it
  * lazily at their own action time, and Verify/Bench are sequential.
  */
object StreamGate {

  /** Create a session-lived scratch directory for a memoized stream feed:
    * registered for deletion at JVM exit (feeds are session-memoized
    * artifacts, so they must outlive the call that builds them — but not
    * the driver; without the hook every session leaves a full parquet
    * projection of its feed in /tmp forever), and deleted immediately if
    * `build` fails so a half-built feed never lingers. ONE definition —
    * every feed writer (writeOrderedChunks, the KMV and IVM feeds) routes
    * here so the cleanup rule cannot drift across call-site clones. */
  def sessionTempDir(prefix: String)(build: String => Unit): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.operators.Checkpointing.deleteRecursively(tmp)))
    try { build(tmp); tmp }
    catch { case e: Throwable =>
      graft.operators.Checkpointing.deleteRecursively(tmp)
      throw e
    }
  }

  /** Write `f` as `chunks` time-span files with explicitly STAMPED,
    * strictly increasing mtimes — the replay input for gates whose engine
    * semantics depend on arrival order (stale-drop guards):
    * FileStreamSource orders files by modification time with a
    * NONDETERMINISTIC tie-break, so an unstamped multi-file feed could
    * trigger a later chunk first and the engine would silently swallow
    * the earlier one as stale. One definition — the stamping rule must
    * not drift across gates. No pre-sort: every gated operator re-sorts
    * its micro-batch by (ts, id) itself. */
  def writeOrderedChunks(f: DataFrame, tsCol: String, chunks: Int,
      prefix: String): String = {
    import org.apache.spark.sql.functions.{col, max, min}
    val tmp = sessionTempDir(prefix) { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/feed"))
      // one scan computes the bounds + one scan per chunk below: persist
      // so the projection is not recomputed chunks+1 times from the lake
      val cached = f.persist()
      try {
        val b = cached.agg(min(tsCol).as("lo"), max(tsCol).as("hi")).head()
        require(!b.isNullAt(0) && !b.isNullAt(1),
          s"writeOrderedChunks($prefix): empty input — no $tsCol bounds")
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val span = (hi - lo) / chunks + 1
        for (i <- 0 until chunks) {
          val cdir = s"$tmp/c$i"
          cached.filter(col(tsCol) >= lo + i * span &&
              col(tsCol) < lo + (i + 1) * span)
            .coalesce(1)
            .write.parquet(cdir)
          val listing = java.nio.file.Files.list(java.nio.file.Paths.get(cdir))
          val part = try {
            import scala.jdk.CollectionConverters._
            listing.iterator().asScala
              .find(p => p.getFileName.toString.startsWith("part-")
                && p.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"no part file written in $cdir"))
          } finally listing.close()
          val target = java.nio.file.Paths.get(f"$tmp/feed/chunk-$i%04d.parquet")
          java.nio.file.Files.move(part, target)
          java.nio.file.Files.setLastModifiedTime(target,
            java.nio.file.attribute.FileTime.fromMillis(1000000000L + i * 60000L))
          graft.operators.Checkpointing.deleteRecursively(cdir)
        }
      } finally cached.unpersist(blocking = false)
    }
    s"$tmp/feed"
  }

  /** Drive `streamed` to completion and hand the caller's extractor the
    * full emission set — as a DataFrame over a per-run PARQUET sink
    * directory, never a driver-memory table. Each micro-batch's output
    * lands as parquet files via foreachBatch (append for Append/Update —
    * the emission multiset; overwrite for Complete — the final table), so
    * the DRIVER footprint of a gate run is O(1) regardless of how many
    * rows the engine emits (the r8 memory-sink harness held ~6 M journey
    * edges on the driver for q_transitions_stream at sf1). Extractors must
    * MATERIALIZE their result (Checkpointing.cut, or a bounded collect)
    * before returning — the sink files are deleted in the finally. */
  def run[T](s: SparkSession, streamed: Dataset[_], sinkPrefix: String,
      mode: OutputMode)(extract: DataFrame => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory(s"$sinkPrefix-run").toString
    try {
      val sinkDir = s"$tmp/sink"
      // pre-create so a zero-emission run still reads as an empty frame
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sinkDir))
      val saveMode =
        if (mode == OutputMode.Complete()) "overwrite" else "append"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q = streamed.toDF().writeStream
          .outputMode(mode)
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode(saveMode).parquet(sinkDir)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      extract(s.read.schema(streamed.schema).parquet(sinkDir))
    } finally graft.operators.Checkpointing.deleteRecursively(tmp)
  }
}
