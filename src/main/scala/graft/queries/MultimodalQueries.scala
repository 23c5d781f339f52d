package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column inventory (SURVEY.md §2): binary payload plumbing with
  * typed metadata. The decode itself is a clearly-marked deterministic stub
  * (no image/audio libs in this container); the Spark-side schema,
  * partition-wise batch shape, and column flow are real.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> ((s, dir) =>
      Multimodal.extractFeatures(s, Multimodal.asMedia(Tables.sharded(s, dir, "documents")))
        .orderBy("doc_id")),

    // one-to-many frame sampling over the video slice of the corpus
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(s, Multimodal.asMedia(Tables.sharded(s, dir, "documents")))
        .orderBy("doc_id", "frame_idx")))

  val oracles: Map[String, String] = Map.empty
}
