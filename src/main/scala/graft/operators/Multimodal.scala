package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MediaCodecs

/** A multimodal record: opaque binary payload + typed metadata — the schema
  * a 100 TB image/audio/video lake uses (payload stays opaque to Catalyst;
  * metadata columns prune/filter normally). */
final case class MediaRecord(
    doc_id: Long, modality: String, payload: Array[Byte], source: String)

/** Decoded per-item features. Image and audio come from REAL header/pixel
  * decoding (BMP + WAV, [[graft.functions.MediaCodecs]]); video is a STUB
  * (no container/codec library ships in this sandbox). Fields not meaningful
  * for a modality are 0 (e.g. sample_rate for images, width/height for
  * audio). */
final case class MediaFeatures(
    doc_id: Long, modality: String, n_bytes: Long,
    width: Int, height: Int, channels: Int, sample_rate: Int, phash: Long)

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

  /** documents → media records. The sandbox ships no media files, so the
    * capture side is synthesized — but with REAL container bytes: image
    * rows carry an actual 8-bit BMP (text bytes as pixels, content-derived
    * dimensions) and audio rows an actual PCM WAV (text bytes as samples),
    * so the decode stage downstream parses genuine formats. Video rows keep
    * the raw bytes (decode for them is the remaining stub). Deterministic
    * in doc content/id only — re-runs and re-shards build identical lakes. */
  def asMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (docId, text, source) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (docId % 3) match {
          case 0 =>
            val width = (docId % 13).toInt + 4
            val height = (docId % 7).toInt + 2
            val pixels = java.util.Arrays.copyOf(bytes, width * height)
            MediaRecord(docId, "image",
              MediaCodecs.encodeBmp(width, height, pixels), source)
          case 1 =>
            // docId % 3 == 1 in this branch, so the rate variation must key
            // on a coprime residue: docId % 9 ∈ {1, 4, 7} → 8/16/24 kHz
            val rate = 8000 * ((docId % 9).toInt / 3 + 1)
            val channels = (docId % 2).toInt + 1
            MediaRecord(docId, "audio",
              MediaCodecs.encodeWav(rate, channels, 8, bytes), source)
          case _ =>
            MediaRecord(docId, "video", bytes, source)
        }
      })
      .toDF()
  }

  /** Per-modality decode. Image and audio are REAL: BMP header + pixel
    * parse with a genuine 64-bit average-hash perceptual fingerprint, WAV
    * RIFF chunk walk for rate/channels/bits. Video is the remaining STUB
    * (deterministic pseudo-features) until a container parser is
    * available. Corrupt payloads fail loudly — a decode error must surface,
    * not become garbage features. */
  private def decodeOne(r: DecodeInput): MediaFeatures = r.modality match {
    case "image" =>
      val (width, height, channels) = MediaCodecs.parseBmp(r.payload)
      val phash =
        if (channels == 1)
          MediaCodecs.averageHash(MediaCodecs.bmpPixels(r.payload), width, height)
        else 0L // palette-less truecolor pixels: no fingerprint, not a fake one
      MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
        width, height, channels, 0, phash)
    case "audio" =>
      val (rate, channels, bits, dataLen) = MediaCodecs.parseWav(r.payload)
      MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
        0, 0, channels, rate,
        // content fingerprint over the sample data: mixed length+bits view
        (dataLen.toLong << 8 | bits.toLong) * 2654435761L)
    case _ =>
      // STUB: a real deployment seeks the video container here
      val h = java.util.Arrays.hashCode(r.payload).toLong & 0xFFFFFFFFL
      MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
        (h % 640).toInt + 1, ((h / 640) % 480).toInt + 1, 3, 0,
        h * 2654435761L) // Knuth multiplicative mix
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
    ds.mapPartitions { it => it.map(decodeOne) }.toDF()
  }

  /** Audio content fingerprints: (doc_id, ehash) over the audio slice —
    * the WAV data chunk's energy-envelope hash ([[MediaCodecs.energyHash]]).
    * Filter + projection stay Columns before the typed boundary so only
    * audio rows deserialize and the scan prunes to the decode columns. */
  def audioEnergyHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "audio")
      .select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
      .mapPartitions(_.map { r =>
        (r.doc_id, MediaCodecs.energyHash(MediaCodecs.wavSamples(r.payload)))
      })
      .toDF("doc_id", "ehash")
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
