package graft.streaming

import java.nio.ByteBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.{ChangeEvent, PgOutput, RelationMsg, RelationRegistry, TruncateMsg}

/** Streaming pgoutput decode — the reference's live capture loop
  * (postrack.go:343-413: read XLogData, parse, dispatch) re-expressed as a
  * stateful Structured Streaming transform, so a capture process that drops
  * raw frames into a directory becomes a continuously decoded ChangeEvent
  * stream with checkpointed schema state.
  *
  * Scale/state shape: frames are keyed by relation id, and the per-group
  * state is that relation's LSN-versioned schema history — O(#schema
  * versions) per table, not O(events). RelationMessages update the state;
  * data messages decode against the latest version at-or-before their LSN
  * (same registry semantics as the batch `PgOutput.decodeFeed`). The state
  * survives micro-batches and restarts (checkpointed), which is what lets a
  * relation registered in batch 1 decode data arriving hours later, and a
  * mid-stream schema change (new RelationMessage) take effect exactly from
  * its LSN onward.
  */
object PgOutputStream {

  /** Relation id a frame belongs to, without a full decode: 'R'/'I'/'U'/'D'
    * carry it as the int32 right after the type byte. */
  private def peekRelId(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(1)

  /** Route a raw frame to its relation group(s). TRUNCATE lists several
    * relations in one frame — split it into per-relation single-id TRUNCATE
    * frames so each group's schema state stays self-contained. Begin/Commit
    * carry no relation and produce no events: dropped here (their LSN
    * bookkeeping lives in the slot store, not the decode). Type ('Y'),
    * Origin ('O'), and logical Message ('M') frames are benign pgoutput
    * metadata a real publication emits (e.g. 'Y' precedes RelationMessage
    * for non-builtin column types) — the reference's handler switch ignores
    * them, so they are dropped rather than killing the stream. Anything
    * else is a protocol error and fails with a labeled exception. */
  private def route(lsn: Long, bytes: Array[Byte]): Iterator[(Int, Long, Array[Byte])] =
    bytes(0).toChar match {
      case 'R' | 'I' | 'U' | 'D' => Iterator.single((peekRelId(bytes), lsn, bytes))
      case 'T' =>
        val t = PgOutput.decode(bytes).asInstanceOf[TruncateMsg]
        t.relationIds.iterator.map(id =>
          (id, lsn, PgOutput.encode(TruncateMsg(t.options, Seq(id)))))
      case 'B' | 'C' | 'Y' | 'O' | 'M' => Iterator.empty
      case other => throw new IllegalArgumentException(
        s"unknown pgoutput frame type '$other' at lsn $lsn")
    }

  /** `frames`: streaming (lsn, data) raw pgoutput frames, e.g. from
    * `frameSource`. Returns the decoded ChangeEvent stream (append mode). */
  def decodeStream(spark: SparkSession, frames: Dataset[(Long, Array[Byte])]): Dataset[ChangeEvent] = {
    import spark.implicits._
    frames
      .flatMap { case (lsn, bytes) => route(lsn, bytes) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (relId: Int, it: Iterator[(Int, Long, Array[Byte])],
         state: GroupState[Seq[(Long, RelationMsg)]]) =>
          // sort by LSN so a RelationMessage in this batch registers before
          // the data frames behind it (file-source batches are unordered)
          val batch = it.toSeq.sortBy(_._2)
          var versions = state.getOption.getOrElse(Seq.empty)
          var registry = RelationRegistry.build(versions)
          val out = Seq.newBuilder[ChangeEvent]
          batch.foreach { case (_, lsn, bytes) =>
            if (bytes(0) == 'R'.toByte) {
              versions :+= (lsn -> PgOutput.decode(bytes).asInstanceOf[RelationMsg])
              registry = RelationRegistry.build(versions)
            } else out ++= PgOutput.toEvents(registry, lsn, bytes)
          }
          state.update(versions)
          out.result().iterator
      }
  }

  /** File-drop source of raw pgoutput frames: the capture side appends
    * parquet batches of (lsn long, data binary) — the durable transport from
    * a postrack-style capture process into the streaming decode. */
  def frameSource(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    spark.readStream
      .schema("lsn LONG, data BINARY")
      .parquet(dir)
      .as[(Long, Array[Byte])]
  }
}
