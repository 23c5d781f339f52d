package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the three container formats whose layouts are simple
  * enough to handle without native libraries: BMP (BITMAPINFOHEADER),
  * WAV (RIFF/fmt ), and uncompressed-DIB AVI (RIFF/hdrl/movi). These are
  * REAL decoders — `mm_metadata`'s image/audio/video features come from
  * parsing actual bytes laid out per the public format specs, not from a
  * pseudo-hash. The encoders exist for the synthesis side (the sandbox has
  * no media files) and for golden specs; the parsers never assume the
  * encoder produced the input (chunk-walking RIFF parses, explicit
  * magic/bounds checks, loud failure on corrupt data).
  */
object MediaCodecs {

  // ------------------------------------------------------------------ BMP

  /** Encode an 8-bit grayscale BMP (BITMAPINFOHEADER + 256-entry palette),
    * rows padded to 4 bytes, bottom-up. `pixels` is row-major
    * width × height bytes. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"encodeBmp: need width*height=${width * height} pixels, got ${pixels.length}")
    val rowSize = (width + 3) / 4 * 4
    val pixelOffset = 14 + 40 + 256 * 4
    val fileSize = pixelOffset + rowSize * height
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(pixelOffset)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(8)
      .putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835)
      .putInt(256).putInt(0)
    var i = 0
    while (i < 256) { // grayscale palette BGRA
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    var row = height - 1 // bottom-up storage
    while (row >= 0) {
      b.put(pixels, row * width, width)
      var pad = width
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      row -= 1
    }
    b.array()
  }

  /** `(width, height, channels)` from a BMP header. Handles the common
    * BITMAPINFOHEADER family (header size ≥ 40), top-down (negative
    * height) images, and 8/24/32 bpp. Fails loudly on anything else —
    * corrupt media must surface, not decode to garbage features. */
  def parseBmp(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "BMP magic 'BM' missing")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = b.getInt(14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = b.getInt(18)
    val height = math.abs(b.getInt(22)) // negative = top-down
    val bpp = b.getShort(28).toInt
    require(width > 0 && height > 0, s"bad BMP dimensions ${width}x$height")
    require(bpp == 8 || bpp == 24 || bpp == 32, s"unsupported BMP bpp $bpp")
    (width, height, bpp / 8)
  }

  /** Row-major 8-bit pixels of an 8bpp BMP (palette ignored — index IS the
    * gray level for the grayscale palette [[encodeBmp]] writes). Undoes the
    * bottom-up row order and the 4-byte row padding. */
  def bmpPixels(bytes: Array[Byte]): Array[Byte] = {
    val (width, height, channels) = parseBmp(bytes)
    require(channels == 1, s"bmpPixels expects 8bpp, got ${channels * 8}")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = b.getInt(10)
    val topDown = b.getInt(22) < 0
    val rowSize = (width + 3) / 4 * 4
    require(bytes.length >= pixelOffset + rowSize * height,
      "BMP pixel data truncated")
    val out = new Array[Byte](width * height)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      System.arraycopy(bytes, pixelOffset + srcRow * rowSize, out, row * width, width)
      row += 1
    }
    out
  }

  /** 64-bit average hash (aHash), the classic perceptual fingerprint: mean
    * of each cell of an 8×8 downsample, bit set where the cell is at or
    * above the global mean. Real algorithm over real pixels — near-identical
    * images (small brightness shifts, minor crops) land within small
    * hamming distance. */
  def averageHash(pixels: Array[Byte], width: Int, height: Int): Long = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      "averageHash: pixels must be width*height")
    val cell = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < height) {
      val cy = y * 8 / height
      var x = 0
      while (x < width) {
        val cx = x * 8 / width
        cell(cy * 8 + cx) += pixels(y * width + x) & 0xFF
        cnt(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L
    var n = 0L
    var i = 0
    while (i < 64) { total += cell(i); n += cnt(i); i += 1 }
    val mean = if (n == 0) 0.0 else total.toDouble / n
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cnt(i) > 0 && cell(i).toDouble / cnt(i) >= mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  // ------------------------------------------------------------------ WAV

  /** Encode a PCM WAV: RIFF header, `fmt ` chunk, `data` chunk. */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      pcm: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 &&
      bitsPerSample > 0 && bitsPerSample % 8 == 0,
      s"encodeWav: bad format $sampleRate/$channels/$bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val b = ByteBuffer.allocate(44 + pcm.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + pcm.length).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1 /* PCM */)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    b.put("data".getBytes).putInt(pcm.length).put(pcm)
    b.array()
  }

  /** The PCM payload of the `data` chunk — same loud chunk walk as
    * [[parseWav]] (shared via [[walkWav]]). */
  def wavSamples(bytes: Array[Byte]): Array[Byte] = {
    val (_, _, _, dataOff, dataLen) = walkWav(bytes)
    java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen)
  }

  /** Nearest-neighbor 2× downsample (the RESIZE primitive of the media
    * pipeline): thumb(x, y) = src(2x, 2y), dimensions ⌈w/2⌉ × ⌈h/2⌉ — the
    * sampled coordinates stay in range for odd and even extents alike
    * (2·(⌈n/2⌉−1) ≤ n−1). Pure integer index arithmetic, so any engine
    * replays the byte selection exactly. */
  def thumbnailHalf(pixels: Array[Byte], width: Int, height: Int)
      : (Array[Byte], Int, Int) = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      "thumbnailHalf: pixels must be width*height")
    val w2 = (width + 1) / 2
    val h2 = (height + 1) / 2
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = pixels(2 * y * width + 2 * x)
        x += 1
      }
      y += 1
    }
    (out, w2, h2)
  }

  /** 64-bit energy-envelope fingerprint over unsigned 8-bit samples: sample
    * i lands in window (i·64)/n, bit w is set iff window w's mean amplitude
    * is at or above the global mean — [[averageHash]]'s audio analog (the
    * classic coarse loudness-contour fingerprint). Like aHash, a real hash
    * is never 0 (the loudest window's mean is always ≥ the global mean), so
    * 0 is the "no samples" sentinel. Integer window assignment and sums;
    * the only float op is the final IEEE-double mean compare, which DuckDB
    * reproduces bit-for-bit. */
  def energyHash(samples: Array[Byte]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val w = ((i.toLong * 64) / n).toInt
      val v = samples(i) & 0xFF
      sums(w) += v
      counts(w) += 1
      total += v
      i += 1
    }
    val gmean = total.toDouble / n
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (counts(w) > 0 && sums(w).toDouble / counts(w) >= gmean)
        hash |= (1L << w)
      w += 1
    }
    hash
  }

  /** `(sampleRate, channels, bitsPerSample, dataLength)` from a WAV. Walks
    * the RIFF chunk list for `fmt ` and `data` (chunks may appear in any
    * order, with strangers like LIST in between), rather than trusting
    * fixed offsets. Loud on missing magic or chunks. */
  def parseWav(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val (rate, channels, bits, _, dataLen) = walkWav(bytes)
    (rate, channels, bits, dataLen)
  }

  /** The RIFF chunk walk both WAV readers share:
    * `(rate, channels, bits, dataOffset, dataLength)`. */
  private def walkWav(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(fourCC(0) == "RIFF" && fourCC(8) == "WAVE",
      "WAV RIFF/WAVE magic missing")
    // ALL offset math in Long: chunk sizes are attacker data, and any Int
    // sum (`off + 8`, `off + 8 + size`) can wrap negative and slip past a
    // bounds compare. The loop guard keeps `off` within Int range whenever
    // the body runs, so the Int-typed ByteBuffer reads below are safe.
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val o = off.toInt
      val id = fourCC(o)
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in '$id'")
      if (id == "fmt ") {
        require(size >= 16 && off + 8 + 16 <= bytes.length, "fmt chunk truncated")
        fmt = Some((b.getInt(o + 12), b.getShort(o + 10).toInt,
          b.getShort(o + 22).toInt))
      } else if (id == "data") {
        // a data header claiming more bytes than the payload holds is a
        // truncated/corrupt file — parseBmp's 'pixel data truncated' analog
        require(off + 8 + size <= bytes.length,
          s"WAV data chunk claims $size bytes, payload ends at ${bytes.length}")
        dataOff = o + 8
        dataLen = size
      }
      off += 8L + size + (size & 1) // chunks are word-aligned
    }
    val (rate, channels, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("WAV has no fmt chunk"))
    require(dataLen >= 0, "WAV has no data chunk")
    require(rate > 0 && channels > 0 && bits > 0,
      s"corrupt WAV fmt: rate=$rate channels=$channels bits=$bits")
    (rate, channels, bits, dataOff, dataLen)
  }

  // ------------------------------------------------------------------ AVI

  /** Encode an uncompressed 8-bit grayscale AVI (the RIFF 'AVI ' layout:
    * hdrl LIST with avih + one vids strl whose strf is the same
    * BITMAPINFOHEADER + 256-entry palette as [[encodeBmp]]; movi LIST with
    * one '00db' raw-DIB chunk per frame — bottom-up rows padded to 4
    * bytes, exactly a BMP's pixel block). `frames` are row-major top-down
    * width × height bytes each; `usPerFrame` is the frame interval in
    * microseconds (avih dwMicroSecPerFrame, also strh scale over a 1 MHz
    * rate). */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty,
      s"encodeAvi: bad geometry ${width}x$height us=$usPerFrame n=${frames.size}")
    frames.foreach(f => require(f.length == width * height,
      s"encodeAvi: frame must be width*height=${width * height} bytes, got ${f.length}"))
    val rowSize = (width + 3) / 4 * 4
    val frameBytes = rowSize * height
    val strfSize = 40 + 256 * 4
    val strlBody = 4 + (8 + 56) + (8 + strfSize)
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody)
    val moviBody = 4 + frames.size * (8 + frameBytes)
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val b = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(riffBody).put("AVI ".getBytes)
    b.put("LIST".getBytes).putInt(hdrlBody).put("hdrl".getBytes)
    // avih (MainAVIHeader): usPerFrame, maxBytesPerSec, padding, flags,
    // totalFrames, initialFrames, streams, suggestedBufferSize, w, h, rsvd×4
    b.put("avih".getBytes).putInt(56)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    b.put("LIST".getBytes).putInt(strlBody).put("strl".getBytes)
    // strh (AVIStreamHeader): 'vids'/'DIB ', flags, prio, lang,
    // initialFrames, scale, rate (fps = rate/scale), start, length,
    // suggestedBufferSize, quality, sampleSize, rcFrame
    b.put("strh".getBytes).putInt(56)
      .put("vids".getBytes).put("DIB ".getBytes)
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000)
      .putInt(0).putInt(frames.size).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    b.put("strf".getBytes).putInt(strfSize)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(8)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(256).putInt(0)
    var i = 0
    while (i < 256) { // grayscale palette BGRA, as in encodeBmp
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    b.put("LIST".getBytes).putInt(moviBody).put("movi".getBytes)
    frames.foreach { f =>
      b.put("00db".getBytes).putInt(frameBytes)
      var row = height - 1 // bottom-up storage, padded rows (DIB convention)
      while (row >= 0) {
        b.put(f, row * width, width)
        var pad = width
        while (pad < rowSize) { b.put(0.toByte); pad += 1 }
        row -= 1
      }
    }
    b.array()
  }

  /** Encode an MJPEG AVI: same RIFF layout as [[encodeAvi]] but the stream
    * is compressed — strh handler and strf biCompression are 'MJPG', there
    * is no palette, and each '00dc' movi chunk holds one frame's JPEG bytes
    * verbatim (variable length, odd sizes padded to even per RIFF). The
    * JPEG payloads are opaque here: the container layer frames them, a
    * decoder (not shipped — no image libs in this environment) would decode
    * them. Each frame must carry the JPEG SOI/EOI markers so the walker can
    * validate it is framing actual JPEG streams. */
  def encodeAviMjpeg(width: Int, height: Int, usPerFrame: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && jpegFrames.nonEmpty,
      s"encodeAviMjpeg: bad geometry ${width}x$height us=$usPerFrame n=${jpegFrames.size}")
    jpegFrames.foreach(f => require(isJpeg(f),
      "encodeAviMjpeg: frame payload missing JPEG SOI/EOI markers"))
    val maxFrame = jpegFrames.map(_.length).max
    val strlBody = 4 + (8 + 56) + (8 + 40) // strh + bare BITMAPINFOHEADER
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody)
    val moviBody = 4 + jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val b = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(riffBody).put("AVI ".getBytes)
    b.put("LIST".getBytes).putInt(hdrlBody).put("hdrl".getBytes)
    b.put("avih".getBytes).putInt(56)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(jpegFrames.size).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    b.put("LIST".getBytes).putInt(strlBody).put("strl".getBytes)
    b.put("strh".getBytes).putInt(56)
      .put("vids".getBytes).put("MJPG".getBytes)
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000)
      .putInt(0).putInt(jpegFrames.size).putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    b.put("strf".getBytes).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put("MJPG".getBytes).putInt(width * height * 3).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    b.put("LIST".getBytes).putInt(moviBody).put("movi".getBytes)
    jpegFrames.foreach { f =>
      b.put("00dc".getBytes).putInt(f.length).put(f)
      if ((f.length & 1) == 1) b.put(0.toByte) // RIFF even-byte padding
    }
    b.array()
  }

  @inline private def isJpeg(f: Array[Byte]): Boolean =
    f.length >= 4 && f(0) == 0xff.toByte && f(1) == 0xd8.toByte &&
      f(f.length - 2) == 0xff.toByte && f(f.length - 1) == 0xd9.toByte

  /** The video stream's compression fourcc from the strl strf
    * BITMAPINFOHEADER: "DIB" for uncompressed (biCompression 0), otherwise
    * the fourcc as text (e.g. "MJPG"). */
  def aviCompression(bytes: Array[Byte]): String = {
    // strl nests inside the hdrl LIST (not top-level): walk hdrl's content
    val (hdrlOff, hdrlEnd) = findList(bytes, "hdrl")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var strl = -1L
    var strlEnd = -1L
    var scan = hdrlOff
    while (strl < 0 && scan + 12 <= hdrlEnd) {
      val o = scan.toInt
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI '${fourCC(bytes, o)}'")
      if (fourCC(bytes, o) == "LIST" && fourCC(bytes, o + 8) == "strl") {
        strl = scan + 12; strlEnd = scan + 8 + size
      }
      scan += 8L + size + (size & 1)
    }
    require(strl >= 0, "AVI hdrl has no strl LIST")
    var off = strl
    while (off + 8 <= strlEnd) {
      val o = off.toInt
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI '${fourCC(bytes, o)}'")
      if (fourCC(bytes, o) == "strf") {
        require(size >= 40 && off + 8 + 40 <= bytes.length, "strf chunk truncated")
        val compression = b.getInt(o + 8 + 16) // BITMAPINFOHEADER.biCompression
        return if (compression == 0) "DIB" else fourCC(bytes, o + 8 + 16)
      }
      off += 8L + size + (size & 1)
    }
    throw new IllegalArgumentException("AVI strl has no strf chunk")
  }

  /** The RAW movi frame chunk payloads ('00db'/'00dc'), compression-
    * agnostic: for a DIB stream these are padded bottom-up pixel blocks,
    * for MJPEG they are whole JPEG streams (validated by SOI/EOI markers —
    * the container walk is real, the JPEG entropy decode is out of scope
    * here and belongs to an image library). Frame count must match the
    * avih header, as in [[aviFrames]]. */
  def aviFrameChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val (_, _, _, totalFrames) = parseAvi(bytes)
    val mjpeg = aviCompression(bytes) == "MJPG"
    val (moviOff, moviEnd) = findList(bytes, "movi")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Vector.newBuilder[Array[Byte]]
    var n = 0
    var off = moviOff
    while (off + 8 <= moviEnd) {
      val o = off.toInt
      val id = fourCC(bytes, o)
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI movi '$id'")
      require(off + 8 + size <= bytes.length,
        s"AVI movi chunk '$id' claims $size bytes, payload ends at ${bytes.length}")
      if (id.endsWith("db") || id.endsWith("dc")) {
        val payload = java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
        if (mjpeg) require(isJpeg(payload),
          s"MJPG movi chunk '$id' is not a JPEG stream (SOI/EOI markers missing)")
        out += payload
        n += 1
      }
      off += 8L + size + (size & 1)
    }
    require(n == totalFrames,
      s"AVI header declares $totalFrames frames, movi holds $n")
    out.result()
  }

  /** `(width, height, usPerFrame, totalFrames)` from an AVI's avih header.
    * Walks the top-level RIFF chunks for the hdrl LIST and the hdrl LIST
    * for avih (stranger chunks like JUNK/idx1 in between are legal and
    * skipped). Loud on missing magic/chunks or degenerate geometry. */
  def parseAvi(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val (hdrlOff, hdrlEnd) = findList(bytes, "hdrl")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = hdrlOff
    while (off + 8 <= hdrlEnd) {
      val o = off.toInt
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI '${fourCC(bytes, o)}'")
      if (fourCC(bytes, o) == "avih") {
        require(size >= 40 && off + 8 + 40 <= bytes.length, "avih chunk truncated")
        val usPerFrame = b.getInt(o + 8)
        val totalFrames = b.getInt(o + 24)
        val width = b.getInt(o + 40)
        val height = b.getInt(o + 44)
        require(width > 0 && height > 0, s"bad AVI dimensions ${width}x$height")
        require(usPerFrame > 0, s"bad AVI frame interval $usPerFrame us")
        require(totalFrames > 0, s"bad AVI frame count $totalFrames")
        return (width, height, usPerFrame, totalFrames)
      }
      off += 8L + size + (size & 1)
    }
    throw new IllegalArgumentException("AVI has no avih header chunk")
  }

  /** The decoded frames of an uncompressed-DIB AVI: one row-major top-down
    * width × height byte array per '00db'/'00dc' movi chunk (bottom-up rows
    * un-padded like [[bmpPixels]]). Frame count must match the avih header
    * — a container whose index lies about its content is corrupt. */
  def aviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val comp = aviCompression(bytes)
    require(comp == "DIB",
      s"aviFrames decodes uncompressed-DIB streams only; this AVI is " +
        s"'$comp' — use aviFrameChunks for container-level access")
    val (width, height, _, totalFrames) = parseAvi(bytes)
    val rowSize = (width + 3) / 4 * 4
    val (moviOff, moviEnd) = findList(bytes, "movi")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Vector.newBuilder[Array[Byte]]
    var n = 0
    var off = moviOff
    while (off + 8 <= moviEnd) {
      val o = off.toInt
      val id = fourCC(bytes, o)
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI movi '$id'")
      require(off + 8 + size <= bytes.length,
        s"AVI movi chunk '$id' claims $size bytes, payload ends at ${bytes.length}")
      if (id.endsWith("db") || id.endsWith("dc")) {
        require(size == rowSize * height,
          s"AVI frame chunk is $size bytes, expected ${rowSize * height}")
        val px = new Array[Byte](width * height)
        var row = 0
        while (row < height) {
          System.arraycopy(bytes, o + 8 + (height - 1 - row) * rowSize,
            px, row * width, width)
          row += 1
        }
        out += px
        n += 1
      }
      off += 8L + size + (size & 1)
    }
    require(n == totalFrames,
      s"AVI header declares $totalFrames frames, movi holds $n")
    out.result()
  }

  @inline private def fourCC(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Byte range (start, end) of the named LIST's content (after its type
    * fourcc) in a RIFF AVI — the chunk walk [[parseAvi]] and [[aviFrames]]
    * share. Long offset math for the same wrap-safety as [[walkWav]]. */
  private def findList(bytes: Array[Byte], listType: String): (Long, Long) = {
    require(bytes.length >= 12, s"AVI too short: ${bytes.length} bytes")
    require(fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "AVI ",
      "AVI RIFF magic missing")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12L
    while (off + 12 <= bytes.length) {
      val o = off.toInt
      val id = fourCC(bytes, o)
      val size = b.getInt(o + 4)
      require(size >= 0, s"negative chunk size in AVI '$id'")
      require(off + 8 + size <= bytes.length,
        s"AVI chunk '$id' claims $size bytes, payload ends at ${bytes.length}")
      if (id == "LIST" && fourCC(bytes, o + 8) == listType)
        return (off + 12, off + 8 + size)
      off += 8L + size + (size & 1)
    }
    throw new IllegalArgumentException(s"AVI has no $listType LIST")
  }
}
