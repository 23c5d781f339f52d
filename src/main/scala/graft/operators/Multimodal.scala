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

/** Multimodal column plumbing. Decode/feature-extract runs partition-wise
  * over the binary payload (`mapPartitions`) — the Scala analog of an
  * arrow-batched decode UDF: one iterator per partition, vectorizable batch
  * shape, no per-row driver involvement.
  */
object Multimodal {

  /** documents → media records: text payload standing in for an opaque blob
    * (the container ships no image/audio decoders). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("modality"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** STUB DECODE: a real deployment calls an image/audio codec on
    * `payload` here. This stand-in derives deterministic pseudo-features
    * from the bytes so the full pipeline (schema in → partition-wise batch
    * decode → typed features out) is exercised end-to-end. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
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
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    // partition-wise batch decode: iterator-in/iterator-out, so a real codec
    // could amortize model/codec init once per partition
    ds.mapPartitions { it => it.map(decodeStub) }.toDF()
  }
}
