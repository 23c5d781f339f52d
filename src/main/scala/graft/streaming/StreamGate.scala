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
