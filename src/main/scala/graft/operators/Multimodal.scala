package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata — the schema
  * a 100 TB image/audio/video lake uses (payload stays opaque to Catalyst;
  * metadata columns prune/filter normally). */
final case class MediaRecord(
    doc_id: Long, modality: String, payload: Array[Byte], source: String)

/** Decoded per-item features. At scale these come from a real decoder; the
  * decode body below is a STUB. */
final case class MediaFeatures(
    doc_id: Long, modality: String, n_bytes: Long,
    width: Int, height: Int, channels: Int, phash: Long)

/** The columns the decoders actually consume. Narrower than MediaRecord on
  * purpose: deserializing only (doc_id, modality, payload) lets Catalyst
  * prune every other column out of the scan before the typed boundary. */
final case class DecodeInput(doc_id: Long, modality: String, payload: Array[Byte])

/** Multimodal column plumbing. Decode/feature-extract runs partition-wise
  * over the binary payload (`mapPartitions`) — the Scala analog of an
  * arrow-batched decode UDF: one iterator per partition, vectorizable batch
  * shape, no per-row driver involvement.
  */
object Multimodal {

  /** documents → media records: text payload standing in for an opaque blob
    * (the container ships no image/audio decoders). Modality assigned
    * deterministically so the mix exercises per-modality branches. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** STUB DECODE: a real deployment calls an image/audio codec on
    * `payload` here. This stand-in derives deterministic pseudo-features
    * from the bytes so the full pipeline (schema in → partition-wise batch
    * decode → typed features out) is exercised end-to-end. */
  private def decodeStub(r: DecodeInput): MediaFeatures = {
    val h = java.util.Arrays.hashCode(r.payload).toLong & 0xFFFFFFFFL
    MediaFeatures(
      doc_id = r.doc_id,
      modality = r.modality,
      n_bytes = r.payload.length.toLong,
      width = (h % 640).toInt + 1,
      height = ((h / 640) % 480).toInt + 1,
      channels = 3,
      phash = h * 2654435761L) // Knuth multiplicative mix
  }

  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    // project to the decode columns BEFORE the typed boundary so column
    // pruning reaches the scan (a MediaRecord encoder would force `source`
    // and anything else in the lake schema to be read just to be dropped)
    val ds: Dataset[DecodeInput] =
      media.select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
    // partition-wise batch decode: iterator-in/iterator-out, so a real codec
    // could amortize model/codec init once per partition
    ds.mapPartitions { it => it.map(decodeStub) }.toDF()
  }

  /** STUB FRAME SAMPLER: a real deployment seeks the container format and
    * decodes ~1 frame/sec here. The stand-in emits a deterministic
    * payload-derived frame count (1-5) with per-frame pseudo-features, so
    * the one-to-many shape (media row → frame rows) and its partition
    * behavior are exercised for real. */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    // filter + prune as Columns BEFORE deserialization: a typed
    // filter(r => r.modality == "video") would deserialize every row of
    // every modality only to drop 2/3 of them, and block pushdown to the
    // scan entirely
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
      .flatMap { r =>
        val h = java.util.Arrays.hashCode(r.payload).toLong & 0xFFFFFFFFL
        val nFrames = (h % 5).toInt + 1
        (0 until nFrames).map { f =>
          (r.doc_id, f, f * 1000L, (h * 2654435761L) ^ (f * 0x9E3779B97F4A7C15L))
        }
      }
      .toDF("doc_id", "frame_idx", "ts_offset_ms", "frame_phash")
  }
}
