package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MediaCodecs

/** A multimodal record: opaque binary payload + typed metadata — the schema
  * a 100 TB image/audio/video lake uses (payload stays opaque to Catalyst;
  * metadata columns prune/filter normally). */
final case class MediaRecord(
    doc_id: Long, modality: String, payload: Array[Byte], source: String)

/** Decoded per-item features. ALL modalities come from REAL container
  * decoding ([[graft.functions.MediaCodecs]]): BMP header+pixel parse for
  * images, WAV RIFF chunk walk for audio, AVI RIFF hdrl/movi walk with
  * per-frame DIB decode for video. Fields not meaningful for a modality
  * are 0 (e.g. sample_rate for images, width/height for audio). */
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
    * dimensions), audio rows an actual PCM WAV (text bytes as samples),
    * and video rows an actual uncompressed-DIB AVI (consecutive text-byte
    * slices as frames, zero-padded past the end), so the decode stage
    * downstream parses genuine formats for every modality. Deterministic
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
            // Planted near-dup pairs (r7): docs with docId ≡ 1 or 16
            // (mod 30) carry a deterministic 160-byte sample pattern keyed
            // by the PAIR id g = docId − (docId%30 == 16 ? 15 : 0) — so
            // {g, g+15} are byte-identical clips (energy-hash hamming 0)
            // in different containers (rate/channels still differ by
            // docId). One pair per 30 docs: the near-dup relation stays
            // LINEAR in corpus size, but the audio pair → cluster → keep
            // chain exercises real rows at every SF instead of passing
            // vacuously on 0 = 0. Still deterministic in docId alone.
            val samples =
              if (docId % 30 == 1 || docId % 30 == 16) {
                val g = docId - (if (docId % 30 == 16) 15L else 0L)
                Array.tabulate(160) { i =>
                  ((((g % 1048576L) * 31L + i) * 97L + 13L) % 256L).toByte
                }
              } else bytes
            MediaRecord(docId, "audio",
              MediaCodecs.encodeWav(rate, channels, 8, samples), source)
          case _ =>
            // 4 fps (250 ms/frame); frame f's pixels are the text bytes
            // from offset f·w·h, zero-padded — every frame differs, so the
            // per-frame perceptual hashes downstream are genuinely distinct
            val w = (docId % 11).toInt + 4
            val h = (docId % 5).toInt + 3
            val nFrames = (docId % 4).toInt + 2
            val frames = (0 until nFrames).map { f =>
              val px = new Array[Byte](w * h)
              val start = f * w * h
              val avail = math.max(0, math.min(bytes.length - start, w * h))
              if (avail > 0) System.arraycopy(bytes, start, px, 0, avail)
              px
            }
            MediaRecord(docId, "video",
              MediaCodecs.encodeAvi(w, h, 250000, frames), source)
        }
      })
      .toDF()
  }

  /** Per-modality decode, all REAL: BMP header + pixel parse with a genuine
    * 64-bit average-hash perceptual fingerprint; WAV RIFF chunk walk for
    * rate/channels/bits; AVI RIFF hdrl parse + first-frame DIB decode with
    * the same average-hash over the frame pixels. Corrupt payloads fail
    * loudly — a decode error must surface, not become garbage features. */
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
      // real container decode: the representative fingerprint is the first
      // frame's average-hash (the thumbnail convention)
      val (w, h, _, _) = MediaCodecs.parseAvi(r.payload)
      val frame0 = MediaCodecs.aviFrames(r.payload).head
      MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
        w, h, 1, 0, MediaCodecs.averageHash(frame0, w, h))
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

  /** Image RESIZE pass: decode each 8bpp BMP, nearest-neighbor-downsample
    * to half extent ([[MediaCodecs.thumbnailHalf]]), and emit the thumbnail
    * geometry, its average-hash, and the exact integer sum of its sampled
    * bytes (the strongest cheap gate on the byte selection). Same typed
    * mapPartitions shape as [[extractFeatures]] — the batch-decode seam a
    * real resize kernel (SIMD/GPU) would plug into. */
  def imageThumbnails(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "image")
      .select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
      .mapPartitions(_.map { r =>
        val (w, h, channels) = MediaCodecs.parseBmp(r.payload)
        require(channels == 1, s"thumbnail pass expects 8bpp, got ${channels * 8}")
        val px = MediaCodecs.bmpPixels(r.payload)
        val (tp, w2, h2) = MediaCodecs.thumbnailHalf(px, w, h)
        var sum = 0L
        var i = 0
        while (i < tp.length) { sum += tp(i) & 0xFF; i += 1 }
        (r.doc_id, w, h, w2, h2, MediaCodecs.averageHash(tp, w2, h2), sum)
      })
      .toDF("doc_id", "width", "height", "thumb_w", "thumb_h",
        "thumb_phash", "thumb_checksum")
  }

  /** Audio DOWNSAMPLE pass (the resample verb — the audio analog of
    * [[imageThumbnails]]): decode each WAV, decimate by 2 at FRAME
    * granularity (out frame f = src frame 2f over blockAlign-byte frames,
    * ⌈F/2⌉ frames out, a trailing partial frame dropped — pure integer
    * index arithmetic, so the byte selection replays exactly), re-encode
    * at half the sample rate (same duration, half the data), and RE-PARSE
    * the produced container — the reported rate/length come from the new
    * bytes' own header walk, so the encode→parse roundtrip of the emitted
    * artifact is inside the gate, not assumed. Reports the decimated
    * payload's energy-envelope hash next to container accounting. Same
    * typed mapPartitions batch seam as the other decode passes (where a
    * real resampler kernel would plug in); map-only, zero shuffles. */
  def audioDownsample(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "audio")
      .select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
      .mapPartitions(_.map { r =>
        val (rate, channels, bits, _) = MediaCodecs.parseWav(r.payload)
        val samples = MediaCodecs.wavSamples(r.payload)
        val ba = channels * bits / 8
        val frames = samples.length / ba
        val f2 = (frames + 1) / 2
        val out = new Array[Byte](f2 * ba)
        var f = 0
        while (f < f2) {
          System.arraycopy(samples, 2 * f * ba, out, f * ba, ba)
          f += 1
        }
        val down = MediaCodecs.encodeWav(rate / 2, channels, bits, out)
        val (rate2, _, _, dataLen2) = MediaCodecs.parseWav(down)
        (r.doc_id, rate.toLong, rate2.toLong, channels.toLong, frames.toLong,
          f2.toLong, down.length.toLong, dataLen2.toLong,
          MediaCodecs.energyHash(MediaCodecs.wavSamples(down)))
      })
      .toDF("doc_id", "rate", "ds_rate", "channels", "n_frames",
        "ds_frames", "ds_bytes", "ds_data_len", "ds_energy")
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

  /** REAL frame sampler: walks each video's AVI container, decodes every
    * movi DIB frame, and emits (frame index, timestamp from the header's
    * frame interval, per-frame average-hash) — the one-to-many media-row →
    * frame-rows shape a video curation pipeline fans out on. */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    // filter + prune as Columns BEFORE deserialization: a typed
    // filter(r => r.modality == "video") would deserialize every row of
    // every modality only to drop 2/3 of them, and block pushdown to the
    // scan entirely
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("modality"), col("payload")).as[DecodeInput]
      .flatMap { r =>
        val (w, h, usPerFrame, _) = MediaCodecs.parseAvi(r.payload)
        MediaCodecs.aviFrames(r.payload).zipWithIndex.map { case (px, f) =>
          (r.doc_id, f, f.toLong * (usPerFrame / 1000),
            MediaCodecs.averageHash(px, w, h))
        }
      }
      .toDF("doc_id", "frame_idx", "ts_offset_ms", "frame_phash")
  }
}
