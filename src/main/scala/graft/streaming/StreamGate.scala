package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

/** Shared driver for the oracle-gated STREAMING-ENGINE runs
  * (cdc_stream_snapshot, cdc_maintained_agg, q_kmv_stream,
  * q_zscore_stream): drive a streaming Dataset into a uniquely-named
  * memory sink, drain it synchronously, hand the sink table to the
  * caller's extractor, and ALWAYS — on success or failure — drop the sink
  * view and delete the per-run checkpoint/state-store tree. One
  * definition, because the cleanup rule (a failed drain must not pin a
  * sink view or leak a state tree in /tmp) and the conf-pin rule (the
  * stream thread captures spark.sql.shuffle.partitions asynchronously
  * after start(), so the session conf must stay pinned through the whole
  * synchronous drain) are too easy to drift across call-site clones.
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
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    // feeds are session-memoized artifacts, so they must outlive this call
    // — but not the JVM: without this hook every driver session would
    // leave a full parquet copy of its feed projections in /tmp forever
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.operators.Checkpointing.deleteRecursively(tmp)))
    try {
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
      s"$tmp/feed"
    } catch { case e: Throwable =>
      // a half-built feed must not linger until JVM exit
      graft.operators.Checkpointing.deleteRecursively(tmp)
      throw e
    }
  }

  def run[T](s: SparkSession, streamed: Dataset[_], sinkPrefix: String,
      mode: OutputMode)(extract: DataFrame => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory(s"$sinkPrefix-run").toString
    val sink = sinkPrefix + "_" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q = streamed.writeStream.format("memory").queryName(sink)
          .outputMode(mode)
          .option("checkpointLocation", s"$tmp/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      extract(s.table(sink))
    } finally {
      s.catalog.dropTempView(sink) // false (not a throw) when start failed
      graft.operators.Checkpointing.deleteRecursively(tmp)
    }
  }
}
