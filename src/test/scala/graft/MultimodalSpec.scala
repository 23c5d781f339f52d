package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asMedia assigns a deterministic modality mix; features are total") {
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val mix = media.groupBy("modality").count().as[(String, Long)].collect().toMap
    assert(mix.keySet == Set("image", "audio", "video"))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    assert(feats.filter($"n_bytes" <= 0).count() == 0)
    // real image decode: positive dimensions, 8bpp grayscale
    assert(feats.filter($"modality" === "image" &&
      ($"width" <= 0 || $"height" <= 0 || $"channels" =!= 1)).count() == 0)
    // real audio decode: positive sample rate, 1-2 channels
    assert(feats.filter($"modality" === "audio" &&
      ($"sample_rate" <= 0 || $"channels" < 1 || $"channels" > 2)).count() == 0)
    assert(feats.filter($"modality" === "video" &&
      ($"width" <= 0 || $"height" <= 0)).count() == 0)
  }

  test("BMP decode: golden header bytes parse to known dimensions and pixels") {
    import graft.functions.MediaCodecs
    // round-trip through the encoder
    val px = Array.tabulate[Byte](8)(i => (i * 30).toByte)
    val bmp = MediaCodecs.encodeBmp(4, 2, px)
    assert(MediaCodecs.parseBmp(bmp) == ((4, 2, 1)))
    assert(MediaCodecs.bmpPixels(bmp).toSeq == px.toSeq)
    // golden: a hand-built 24bpp 2x1 header the encoder never produced —
    // the parser must not depend on the encoder's layout choices
    val b = java.nio.ByteBuffer.allocate(62)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(62).putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(2).putInt(-1 /* top-down */).putShort(1).putShort(24)
    b.putInt(0).putInt(8).putInt(0).putInt(0).putInt(0).putInt(0)
    assert(MediaCodecs.parseBmp(b.array()) == ((2, 1, 3)))
    // corrupt media fails loudly, never decodes to garbage features
    assertThrows[IllegalArgumentException](
      MediaCodecs.parseBmp("not a bitmap at all, just text".getBytes))
    // average hash: constant image hashes all-ones; a half-dark image differs
    val flat = MediaCodecs.averageHash(Array.fill[Byte](64)(100.toByte), 8, 8)
    assert(flat == -1L) // every cell >= mean
    val split = MediaCodecs.averageHash(
      Array.tabulate[Byte](64)(i => if (i < 32) 0 else 200.toByte), 8, 8)
    assert(java.lang.Long.bitCount(split) == 32)
  }

  test("WAV decode: chunk walk finds fmt/data regardless of stranger chunks") {
    import graft.functions.MediaCodecs
    val pcm = Array.tabulate[Byte](100)(_.toByte)
    val wav = MediaCodecs.encodeWav(16000, 2, 8, pcm)
    assert(MediaCodecs.parseWav(wav) == ((16000, 2, 8, 100)))
    // golden: insert a LIST chunk between WAVE and fmt — real files do this
    val b = java.nio.ByteBuffer.allocate(12 + 12 + 24 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    b.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(44100).putShort(1).putShort(8)
    b.put("data".getBytes).putInt(4).putInt(0)
    assert(MediaCodecs.parseWav(b.array()) == ((44100, 1, 8, 4)))
    assertThrows[IllegalArgumentException](
      MediaCodecs.parseWav("definitely not RIFF data here at all...".getBytes))
    // a data chunk declaring near-Int.MaxValue bytes must fail the bounds
    // require LOUDLY, not wrap the Int compare and return garbage dataLen
    val huge = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    huge.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    huge.put("data".getBytes).putInt(Int.MaxValue - 16)
    val e = intercept[IllegalArgumentException](MediaCodecs.parseWav(huge.array()))
    assert(e.getMessage.contains("claims"), s"wrong failure: ${e.getMessage}")
    // the encoder must refuse formats its own parser rejects
    assertThrows[IllegalArgumentException](
      MediaCodecs.encodeWav(8000, 1, 0, pcm))
  }

  test("sampleFrames: only video rows, 2-5 container frames each, deterministic") {
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(spark, media)
    val perDoc = frames.groupBy("doc_id").count()
    assert(perDoc.filter($"count" < 2 || $"count" > 5).count() == 0)
    // every frame doc is a video doc (doc_id % 3 == 2 under the mix rule)
    assert(frames.filter(pmod($"doc_id", lit(3)) =!= 2).count() == 0)
    // deterministic across runs
    val again = Multimodal.sampleFrames(spark, media)
    assert(frames.exceptAll(again).isEmpty)
  }

  test("AVI codec: round trip, golden walk over stranger chunks, loud corruption") {
    import graft.functions.MediaCodecs
    // round-trip through the encoder: geometry, header timing, exact pixels
    val f0 = Array.tabulate[Byte](15)(i => (i * 16).toByte)
    val f1 = Array.tabulate[Byte](15)(i => (200 - i * 9).toByte)
    val avi = MediaCodecs.encodeAvi(5, 3, 250000, Seq(f0, f1))
    assert(MediaCodecs.parseAvi(avi) == ((5, 3, 250000, 2)))
    val back = MediaCodecs.aviFrames(avi)
    assert(back.size == 2)
    assert(back(0).toSeq == f0.toSeq && back(1).toSeq == f1.toSeq)
    // the byte-size formula the oracle replays: 1248 + nf*(8 + paddedRow*h)
    assert(avi.length == 1248 + 2 * (8 + 8 * 3))
    // golden walk: a JUNK chunk before hdrl and an idx1 after movi — real
    // muxers emit both; the parser must skip strangers, not assume the
    // encoder's layout
    val raw = MediaCodecs.encodeAvi(4, 2, 100000, Seq(Array.fill[Byte](8)(5)))
    val inner = java.util.Arrays.copyOfRange(raw, 12, raw.length)
    val b = java.nio.ByteBuffer
      .allocate(12 + 16 + inner.length + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + 16 + inner.length + 16).put("AVI ".getBytes)
    b.put("JUNK".getBytes).putInt(8).putLong(0L)
    b.put(inner)
    b.put("idx1".getBytes).putInt(8).putLong(0L)
    assert(MediaCodecs.parseAvi(b.array()) == ((4, 2, 100000, 1)))
    assert(MediaCodecs.aviFrames(b.array()).head.toSeq == Seq.fill(8)(5.toByte))
    // corruption is loud: wrong magic, truncated movi frame, frame-count lie
    assertThrows[IllegalArgumentException](
      MediaCodecs.parseAvi("this is not an avi container at all....".getBytes))
    val lying = raw.clone()
    // avih dwTotalFrames lives at top-level 12 + hdrl header 12 + avih header 8 + 16
    val tfOff = 12 + 12 + 8 + 16
    lying(tfOff) = 9
    val e = intercept[IllegalArgumentException](MediaCodecs.aviFrames(lying))
    assert(e.getMessage.contains("declares"), s"wrong failure: ${e.getMessage}")
    // the encoder refuses geometry its parser rejects
    assertThrows[IllegalArgumentException](
      MediaCodecs.encodeAvi(0, 2, 100000, Seq(Array.emptyByteArray)))
    assertThrows[IllegalArgumentException](
      MediaCodecs.encodeAvi(4, 2, 100000, Seq(Array.fill[Byte](3)(1))))
  }

  test("MJPEG AVI: container walk frames JPEG chunks verbatim; DIB decode refuses") {
    import graft.functions.MediaCodecs
    // synthetic JPEG streams: real SOI/EOI markers around arbitrary entropy
    // bytes — the container layer frames them, it never entropy-decodes
    def jpeg(seed: Int, n: Int): Array[Byte] = {
      val body = Array.tabulate[Byte](n)(i => ((seed * 31 + i * 7) & 0x7f).toByte)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ body ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }
    val frames = Seq(jpeg(1, 33), jpeg(2, 50), jpeg(3, 21)) // odd sizes too
    val avi = MediaCodecs.encodeAviMjpeg(16, 9, 40000, frames)
    // geometry comes from the same avih header as DIB containers
    assert(MediaCodecs.parseAvi(avi) == ((16, 9, 40000, 3)))
    assert(MediaCodecs.aviCompression(avi) == "MJPG")
    // chunk walk returns the exact JPEG byte streams (RIFF odd-size padding
    // must not leak into the payloads)
    val chunks = MediaCodecs.aviFrameChunks(avi)
    assert(chunks.map(_.toSeq) == frames.map(_.toSeq))
    // the pixel decoder refuses compressed streams loudly, pointing at the
    // container-level accessor
    val e = intercept[IllegalArgumentException](MediaCodecs.aviFrames(avi))
    assert(e.getMessage.contains("MJPG") && e.getMessage.contains("aviFrameChunks"))
    // DIB containers report DIB and the chunk accessor works there too
    val dib = MediaCodecs.encodeAvi(4, 2, 100000, Seq(Array.fill[Byte](8)(5)))
    assert(MediaCodecs.aviCompression(dib) == "DIB")
    assert(MediaCodecs.aviFrameChunks(dib).size == 1)
    // a movi chunk that is not a JPEG stream in an MJPG container is loud
    val broken = avi.clone()
    val moviFirst = new String(broken).indexOf("00dc")
    broken(moviFirst + 8) = 0 // clobber the SOI marker
    assertThrows[IllegalArgumentException](MediaCodecs.aviFrameChunks(broken))
    // and the encoder refuses payloads without JPEG markers up front
    assertThrows[IllegalArgumentException](
      MediaCodecs.encodeAviMjpeg(4, 2, 100000, Seq(Array.fill[Byte](10)(1))))
  }

  test("video features come from the container: header fields + frame-0 aHash") {
    import graft.functions.MediaCodecs
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val vids = media.filter($"modality" === "video")
      .select($"doc_id", $"payload").as[(Long, Array[Byte])].collect()
    assert(vids.nonEmpty)
    val feats = Multimodal.extractFeatures(spark, media)
      .filter($"modality" === "video")
      .select($"doc_id", $"width", $"height", $"channels", $"phash")
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    vids.take(20).foreach { case (id, payload) =>
      val (w, h, us, nf) = MediaCodecs.parseAvi(payload)
      assert(w == (id % 11 + 4) && h == (id % 5 + 3) && us == 250000 &&
        nf == (id % 4 + 2))
      val (_, fw, fh, ch, phash) = feats(id)
      assert(fw == w && fh == h && ch == 1)
      assert(phash == MediaCodecs.averageHash(MediaCodecs.aviFrames(payload).head, w, h))
    }
  }

  test("sampleFrames pushes the modality filter into the parquet scan") {
    // Over a real media lake (modality materialized as a column, as the
    // 100 TB layout stores it) the video filter must reach the scan — not
    // run as a typed filter after deserializing every modality.
    val dir = java.nio.file.Files.createTempDirectory("media_lake").toString
    Multimodal.asMedia(Tables(spark, sf, "documents"))
      .write.mode("overwrite").parquet(dir)
    val lake = spark.read.parquet(dir)
    val plan = Multimodal.sampleFrames(spark, lake)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(modality,video)"),
      s"modality filter not pushed into the scan:\n$plan")
  }

  test("labelCentroids: identical vectors give cohesion 1.0 (production op)") {
    val v = Array.tabulate(8)(_.toFloat + 1f)
    val df = Seq((0L, v, 1), (1L, v, 1), (2L, v.map(-_), 2)).toDF("vec_id", "embedding", "label")
    val centroids = graft.operators.Embeddings.labelCentroids(df, "label", "embedding")
    val cos = df.join(centroids, "label")
      .select(round(Vectors.cosine($"embedding", $"centroid"), 6).as("c"))
      .as[Double].collect()
    assert(cos.forall(_ == 1.0))
  }

  test("emb_centroids query: cohesion bounded, vector counts total") {
    val out = queries.VectorQueries.queries("emb_centroids")(spark, sf)
      .selectExpr("n_vectors", "mean_cos_to_centroid").as[(Long, Double)].collect()
    assert(out.map(_._1).sum == sources.Tables(spark, sf, "embeddings").count())
    assert(out.forall { case (_, c) => c > -1.0 && c <= 1.0 })
  }

  test("mm_near_dup pigeonhole candidates are lossless vs brute force") {
    // 5 blocks over 64 bits guarantee every hamming ≤ 4 pair shares a
    // block — the bucket join must therefore return EXACTLY the brute-force
    // pair set, not an approximation of it.
    val out = queries.MultimodalQueries.queries("mm_near_dup")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val hashes = queries.MultimodalQueries.queries("mm_metadata")(spark, sf)
      .filter($"modality" === "image").select($"doc_id", $"phash")
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hashes
      (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d.toLong)).toSet
    assert(out == brute, s"bucketed=${out.size} brute=${brute.size}")
    assert(brute.nonEmpty, "test lake must contain near-dup images")
  }

  test("mm_video_near_dup pigeonhole candidates are lossless vs brute force") {
    val out = queries.MultimodalQueries.queries("mm_video_near_dup")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val hashes = queries.MultimodalQueries.queries("mm_metadata")(spark, sf)
      .filter($"modality" === "video").select($"doc_id", $"phash")
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hashes
      (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d.toLong)).toSet
    assert(out == brute, s"bucketed=${out.size} brute=${brute.size}")
  }

  test("emb_quantize codes reconstruct within the quantization-step bound") {
    val rows = queries.VectorQueries.queries("emb_quantize")(spark, sf)
      .selectExpr("dim", "lo", "hi", "n_codes", "mse_ppm")
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(rows.length == 64) // one audit row per dimension
    rows.foreach { case (dim, lo, hi, nCodes, msePpm) =>
      assert(nCodes >= 1 && nCodes <= 256, s"dim $dim used $nCodes codes")
      assert(msePpm >= 0.0)
      // worst-case per-value error is one step (span/256): mse ≤ step²
      val step = (hi - lo) / 256.0
      assert(msePpm <= step * step * 1e6 + 0.01,
        s"dim $dim mse $msePpm ppm exceeds step bound ${step * step * 1e6}")
    }
  }

  test("mm_scene_cuts: one transition row per consecutive frame pair, exact hamming") {
    import graft.functions.MediaCodecs
    val cuts = queries.MultimodalQueries.queries("mm_scene_cuts")(spark, sf)
      .as[(Long, Int, Long, Boolean)].collect()
    assert(cuts.nonEmpty)
    // transitions per video = frames - 1 (nf = id%4+2 → 1..4 transitions)
    val perDoc = cuts.groupBy(_._1).view.mapValues(_.length).toMap
    perDoc.foreach { case (id, n) =>
      assert(n == (id % 4 + 2 - 1), s"doc $id has $n transitions")
    }
    // spot-check the hamming against a direct container decode
    val media = Multimodal.asMedia(Tables(spark, sf, "documents"))
    val (id, payload) = media.filter($"modality" === "video")
      .select($"doc_id", $"payload").as[(Long, Array[Byte])].head()
    val (w, h, _, _) = MediaCodecs.parseAvi(payload)
    val hs = MediaCodecs.aviFrames(payload).map(MediaCodecs.averageHash(_, w, h))
    val expected = hs.sliding(2).map { case Seq(a, b) =>
      java.lang.Long.bitCount(a ^ b).toLong }.toSeq
    val got = cuts.filter(_._1 == id).sortBy(_._2).map(_._3).toSeq
    assert(got == expected, s"doc $id: $got vs $expected")
    cuts.foreach { case (_, _, d, isCut) => assert(isCut == (d > 16)) }
  }

  test("dedup_lsh_audit: counts are consistent and ratios bounded") {
    val Array((nLsh, nExact, nBoth, p, r)) =
      queries.DedupQueries.queries("dedup_lsh_audit")(spark, sf)
        .as[(Long, Long, Long, Double, Double)].collect()
    assert(nBoth <= math.min(nLsh, nExact))
    assert(p >= 0.0 && p <= 1.0 && r >= 0.0 && r <= 1.0)
    // the test corpus's planted dups are exact copies: the sketch must
    // find them all (recall 1.0 at est ≥ 0.5 for identical signatures)
    assert(nExact > 0 && r == 1.0, s"recall $r over $nExact exact pairs")
  }

  test("energyHash: golden envelopes, sentinel, and window mapping") {
    import graft.functions.MediaCodecs
    // loud second half → upper 32 windows at/above the mean, lower below
    val halfLoud = Array.fill(64)(0.toByte) ++ Array.fill(64)(200.toByte)
    assert(MediaCodecs.energyHash(halfLoud) == 0xFFFFFFFF00000000L)
    // constant signal (all 64 windows populated): every window mean equals
    // the global mean → all bits set
    assert(MediaCodecs.energyHash(Array.fill(64)(7.toByte)) == -1L)
    assert(MediaCodecs.energyHash(Array.emptyByteArray) == 0L) // sentinel
    // fewer samples than windows: sample i → window (i*64)/n, empty
    // windows stay 0 — a 2-sample signal sets exactly windows 0 and 32
    val twoSamples = Array(0.toByte, 100.toByte)
    assert(MediaCodecs.energyHash(twoSamples) == (1L << 32))
    // single sample: window 0 mean == global mean → bit 0 only
    assert(MediaCodecs.energyHash(Array(42.toByte)) == 1L)
  }

  test("energyHash survives the WAV container round trip") {
    import graft.functions.MediaCodecs
    val pcm = Array.tabulate(1000)(i => ((i * 37) % 256).toByte)
    val wav = MediaCodecs.encodeWav(8000, 1, 8, pcm)
    assert(java.util.Arrays.equals(MediaCodecs.wavSamples(wav), pcm))
    assert(MediaCodecs.energyHash(MediaCodecs.wavSamples(wav)) ==
      MediaCodecs.energyHash(pcm))
  }

  test("mm_audio_near_dup pigeonhole candidates are lossless vs brute force") {
    val out = queries.MultimodalQueries.queries("mm_audio_near_dup")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val media = operators.Multimodal.asMedia(sources.Tables(spark, sf, "documents"))
    val hashes = operators.Multimodal.audioEnergyHashes(spark, media)
      .filter($"ehash" =!= 0L).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hashes
      (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d.toLong)).toSet
    assert(out == brute, s"bucketed=${out.size} brute=${brute.size}")
  }

  test("bucket cap: lossless at the driver lake, loud when a bucket saturates") {
    import queries.MultimodalQueries.{pigeonholePairs, pigeonOverflowStats, pigeonBucketCap}
    // 1. the driver lake sits far under the cap: the overflow report shows
    //    zero saturation for every modality (so the capped pair build is
    //    provably identical to the uncapped one where correctness is
    //    hash-checked — the three lossless-vs-brute tests above run against
    //    the SAME capped build and already compare to the uncapped truth)
    val report = queries.MultimodalQueries.queries("mm_bucket_overflow")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(report.length == 3)
    report.foreach { case (m, nb, maxB, nSat, skipped) =>
      assert(nb > 0, s"$m: no buckets")
      assert(maxB < pigeonBucketCap, s"$m: max bucket $maxB at the cap — driver lake no longer lossless")
      assert(nSat == 0L && skipped == 0L, s"$m: unexpected saturation")
    }
    // 2. crafted saturation: 6 true pairs {2k, 2k+1} (hamming 1, differing
    //    in one block-2 bit) whose shared blocks 0 and 4 are SATURATED
    //    (12-member buckets, cap 8) but whose shared blocks 1 and 3 are
    //    size-2 buckets — the capped build must still find every pair
    //    (pigeonhole: any unsaturated shared block suffices) and account
    //    the skipped buckets loudly. D codewords keep cross-pair hamming
    //    > 4 so no extra pairs exist.
    val dCode = Seq(0x0L, 0xFL, 0xF0L, 0xFFL, 0xF00L, 0xF0FL) // pairwise hamming >= 4
    val dense = (0 until 12).map { i =>
      val k = i / 2; val m = i % 2
      (i.toLong, 7L | (k.toLong << 13) | (m.toLong << 26) | (dCode(k) << 39))
    }
    val items = dense.toDF("doc_id", "fp")
    val capped = pigeonholePairs(items, bucketCap = 8)
      .as[(Long, Long, Long)].collect().toSet
    val uncapped = pigeonholePairs(items, bucketCap = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    val expectedPairs = (0 until 6).map(k => (2L * k, 2L * k + 1, 1L)).toSet
    assert(uncapped == expectedPairs, s"construction wrong: $uncapped")
    assert(capped == uncapped,
      s"capped lost pairs despite unsaturated agreeing blocks: ${uncapped -- capped}")
    val stats = pigeonOverflowStats(items, "x", bucketCap = 8)
      .as[(String, Long, Long, Long, Long)].head()
    assert(stats._4 == 2L, s"expected blocks 0 and 4 saturated, got ${stats._4}")
    assert(stats._5 == 2L * (12L * 11 / 2), "skipped-candidate accounting off")
    // 3. and when a pair agrees ONLY on the saturated block, the cap drops
    //    it — and says so in the accounting (the measured degradation)
    val only0 = Seq((100L, 7L), (101L, 7L)) // identical in block 0..4? no: fp=7 both → all blocks equal
    val pairAll = pigeonholePairs(only0.toDF("doc_id", "fp"), bucketCap = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairAll.isEmpty, "cap=1 must suppress every bucket of size 2")
  }

  test("planted audio pairs: every {g, g+15} pair present at hamming 0") {
    // the r7 seeding contract: docs with docId ≡ 1 (mod 30) and their
    // +15 partners carry byte-identical sample patterns, so the pair
    // (g, g+15) MUST surface — the driver gate can no longer pass
    // vacuously on an empty pair set
    val pairs = queries.MultimodalQueries.queries("mm_audio_near_dup")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "seeding produced no audio near-dup pairs")
    val maxId = sources.Tables(spark, sf, "documents")
      .agg(org.apache.spark.sql.functions.max($"doc_id")).as[Long].head()
    val expected = (0L to maxId).filter(g => g % 30 == 1 && g + 15 <= maxId)
      .map(g => (g, g + 15L, 0L)).toSet
    assert(expected.subsetOf(pairs.toSet),
      s"missing planted pairs: ${expected -- pairs.toSet}")
  }
}
