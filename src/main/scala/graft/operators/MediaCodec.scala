package graft.operators

/** Real codecs for the media containers the engine decodes natively:
  * RIFF/PCM WAV (audio) and 24-bit uncompressed BMP (image) via plain
  * pure-JVM header parsing, and baseline JPEG via the JDK-bundled
  * `javax.imageio` reader/writer — a REAL compressed codec with zero
  * external dependencies. [[Multimodal.FakeCodec]] remains the
  * clearly-marked stand-in only for the codecs the JDK does not ship
  * (MP3/H.264).
  *
  * All decoders are strict: malformed magic/headers throw rather than
  * guessing, so a bad payload surfaces as a per-row error a pipeline
  * can quarantine.
  */
object MediaCodec {

  // ImageIO's default temp-FILE stream cache would put a disk write on
  // every executor decode; in-memory streams keep the batch decode path
  // allocation-only. Runs once per JVM at first MediaCodec use.
  javax.imageio.ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- WAV

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nSamples: Long) {
    /** Millisecond duration, integer floor — frames / rate. */
    def durationMs: Long =
      if (sampleRate == 0) 0L
      else nSamples / channels * 1000L / sampleRate
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode mono PCM WAV. `bitsPerSample` ∈ {8, 16}: 8-bit takes raw
    * unsigned bytes; 16-bit takes little-endian signed pairs. */
  def encodeWav(data: Array[Byte], sampleRate: Int,
                bitsPerSample: Int = 8, channels: Int = 1): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"bitsPerSample must be 8 or 16, got $bitsPerSample")
    require(sampleRate > 0 && channels > 0,
      s"sampleRate/channels must be positive, got $sampleRate/$channels")
    val out = new Array[Byte](44 + data.length)
    val blockAlign = channels * bitsPerSample / 8
    System.arraycopy("RIFF".getBytes, 0, out, 0, 4)
    putLe32(out, 4, 36 + data.length)
    System.arraycopy("WAVE".getBytes, 0, out, 8, 4)
    System.arraycopy("fmt ".getBytes, 0, out, 12, 4)
    putLe32(out, 16, 16)                       // PCM fmt chunk length
    putLe16(out, 20, 1)                        // audio format = PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * blockAlign)  // byte rate
    putLe16(out, 32, blockAlign)
    putLe16(out, 34, bitsPerSample)
    System.arraycopy("data".getBytes, 0, out, 36, 4)
    putLe32(out, 40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Decode PCM WAV → (meta, samples centered at 0). 8-bit samples are
    * unsigned-with-128-bias in the container, returned as value − 128;
    * 16-bit are little-endian signed. Chunk-walks the RIFF body, so
    * extra chunks (LIST, fact, …) before/after `data` are tolerated. */
  def decodeWav(bytes: Array[Byte]): (WavMeta, Array[Int]) = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && (data == null || sampleRate == 0)) {
      val id = tag(bytes, off)
      val len = le32(bytes, off + 4)
      // long arithmetic: a forged len near Int.MaxValue would overflow
      // an int sum negative and slip past the bound (decodeBmp already
      // guards this way)
      require(len >= 0 && off.toLong + 8L + len.toLong <= bytes.length,
        s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len bytes)")
          require(le16(bytes, off + 8) == 1, "only PCM (format 1) supported")
          channels = le16(bytes, off + 10)
          require(channels >= 1, s"bad channel count $channels")
          sampleRate = le32(bytes, off + 12)
          require(sampleRate > 0, s"bad sample rate $sampleRate")
          bits = le16(bytes, off + 22)
          require(bits == 8 || bits == 16, s"unsupported bits/sample $bits")
        case "data" => data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case _ => () // skip auxiliary chunks
      }
      off += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    require(sampleRate > 0 && data != null, "missing fmt or data chunk")
    val samples =
      if (bits == 8) data.map(b => (b & 0xff) - 128)
      else Array.tabulate(data.length / 2)(i => le16(data, 2 * i).toShort.toInt)
    (WavMeta(sampleRate, channels, bits, samples.length.toLong), samples)
  }

  // ---------------------------------------------------------------- BMP

  /** Encode a bottom-up uncompressed 24-bit BMP from row-major RGB
    * triplets (length = 3 · width · height). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != ${3 * width * height}")
    val rowBytes = (3 * width + 3) / 4 * 4 // rows pad to 4-byte boundary
    val out = new Array[Byte](54 + rowBytes * height)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54)     // pixel offset
    putLe32(out, 14, 40)     // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive = bottom-up
    putLe16(out, 26, 1)      // planes
    putLe16(out, 28, 24)     // bpp
    putLe32(out, 30, 0)      // BI_RGB (uncompressed)
    putLe32(out, 34, rowBytes * height)
    for (y <- 0 until height; x <- 0 until width) {
      val src = 3 * (y * width + x)
      val dst = 54 + (height - 1 - y) * rowBytes + 3 * x
      // BMP stores BGR
      out(dst) = rgb(src + 2); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src)
    }
    out
  }

  /** Decode an uncompressed 24-bit BMP → (width, height, row-major RGB
    * triplets, top-down). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val pixelOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    require(le16(bytes, 28) == 24, "only 24-bit BMP supported")
    require(le32(bytes, 30) == 0, "only uncompressed (BI_RGB) supported")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixelOff >= 54, s"bad pixel offset $pixelOff")
    // long arithmetic: a forged width ~2^30 must fail the bound, not
    // overflow into a "valid" small product
    val rowBytesL = (3L * width + 3) / 4 * 4
    require(3L * width * height <= Int.MaxValue &&
      pixelOff + rowBytesL * height <= bytes.length, "pixel data overruns payload")
    val rowBytes = rowBytesL.toInt
    val rgb = new Array[Byte](3 * width * height)
    for (y <- 0 until height; x <- 0 until width) {
      val src = pixelOff + (height - 1 - y) * rowBytes + 3 * x
      val dst = 3 * (y * width + x)
      rgb(dst) = bytes(src + 2); rgb(dst + 1) = bytes(src + 1); rgb(dst + 2) = bytes(src)
    }
    (width, height, rgb)
  }

  // --------------------------------------------------------------- JPEG

  /** Encode row-major RGB triplets as baseline JPEG via the JDK writer.
    * `quality` ∈ (0, 1]; 1.0f sets all-ones quantization tables (the
    * libjpeg quality-100 scaling), under which a block-constant
    * grayscale image round-trips bit-exactly: each 8×8 block is DC-only,
    * DC quantizes losslessly at step 1, and gray pixels keep Cb=Cr=128
    * exactly through the fixed-point color transforms (coefficient rows
    * sum to one), so chroma subsampling interpolates a constant. */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
                 quality: Float = 1.0f): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != ${3 * width * height}")
    require(quality > 0f && quality <= 1f, s"quality must be in (0,1], got $quality")
    val img = rgbToBufferedImage(width, height, rgb)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Decode baseline JPEG → (width, height, row-major RGB triplets,
    * top-down) via the JDK reader. Strict on magic; an undecodable body
    * past the magic throws (IIOException/NPE-free: ImageIO.read returns
    * null for unreadable streams, converted to a require failure). */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes != null && bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG payload")
    decodeViaImageIO(bytes, "JPEG")
  }

  // ---------------------------------------------------------------- PNG

  /** Encode row-major RGB triplets as PNG via the JDK writer. PNG is
    * LOSSLESS, so any image round-trips bit-exactly — no fixture
    * constraints like the JPEG q=1.0 block-constant construction. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != ${3 * width * height}")
    val img = rgbToBufferedImage(width, height, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", baos))
      throw new IllegalStateException("no PNG writer available in this JDK")
    baos.toByteArray
  }

  /** Decode PNG → (width, height, row-major RGB triplets). Strict on
    * the 8-byte PNG signature. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes != null && bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G', "not a PNG payload")
    decodeViaImageIO(bytes, "PNG")
  }

  /** Row-major RGB triplets → TYPE_3BYTE_BGR BufferedImage — the shared
    * raster build for both ImageIO encoders (the decode twin is
    * [[decodeViaImageIO]]). */
  private def rgbToBufferedImage(width: Int, height: Int,
                                 rgb: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < width * height) {
      data(3 * i) = rgb(3 * i + 2)       // raster stores BGR
      data(3 * i + 1) = rgb(3 * i + 1)
      data(3 * i + 2) = rgb(3 * i)
      i += 1
    }
    img
  }

  private def decodeViaImageIO(bytes: Array[Byte], kind: String): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable $kind payload")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) {
      rgb(3 * i) = ((px(i) >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((px(i) >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (px(i) & 0xff).toByte
      i += 1
    }
    (w, h, rgb)
  }

  /** Container-sniffing image decode: BMP ("BM"), JPEG (FF D8) and PNG
    * (89 "PNG") by magic bytes; anything else is a strict per-row
    * error. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes != null && bytes.length >= 2, "empty image payload")
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) decodeJpeg(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && bytes.length >= 8 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
    else throw new IllegalArgumentException(
      "unsupported image container (expected BMP, JPEG or PNG magic)")
  }

  // ---------------------------------------------------------------- MP3

  /** MPEG-1 Layer III bitrate table (kbps) indexed by the 4-bit header
    * bitrate field; 0 (free) and 15 (bad) are rejected. */
  private val Mp3BitrateKbps =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3SampleRates = Array(44100, 48000, 32000)
  private val Mp3SamplesPerFrame = 1152

  final case class Mp3Meta(nFrames: Long, bitrateKbps: Int, sampleRate: Int,
                           nSamples: Long, totalBytes: Long)

  /** Synthesize a valid constant-bitrate MPEG-1 Layer III frame stream
    * (headers + zero-filled frame bodies). Not an audio ENCODER — the
    * bodies carry no samples — but every header field and frame length
    * is spec-exact, so [[parseMp3Frames]] exercises real container
    * parsing. */
  def buildMp3(nFrames: Int, bitrateIdx: Int, sampleRateIdx: Int = 0): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, s"bad samplerate index $sampleRateIdx")
    val sr = Mp3SampleRates(sampleRateIdx)
    val frameLen = (144L * Mp3BitrateKbps(bitrateIdx) * 1000 / sr).toInt // padding 0
    val out = new Array[Byte](nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      val p = f * frameLen
      out(p) = 0xff.toByte                       // sync 11111111
      out(p + 1) = 0xfb.toByte                   // sync 111 | MPEG1 (11) | Layer III (01) | no CRC (1)
      out(p + 2) = ((bitrateIdx << 4) | (sampleRateIdx << 2)).toByte // padding 0, private 0
      out(p + 3) = 0xc4.toByte                   // mono, no emphasis
      f += 1
    }
    out
  }

  /** REAL MPEG-1 Layer III frame walk: validate each sync word, decode
    * bitrate/samplerate/padding from the header, hop frame lengths
    * (144·bitrate/samplerate + padding — the spec formula), and return
    * stream stats. The per-frame duration is exact in samples
    * (1152/frame); callers derive ms as n_samples·1000/rate. Strict:
    * a broken sync mid-stream or a truncated trailing frame throws
    * (quarantine per row), matching the WAV/BMP contract. Reported
    * bitrate is the FIRST frame's (callers wanting VBR averages fold
    * per-frame rates; the fixture streams here are CBR). */
  def parseMp3Frames(bytes: Array[Byte]): Mp3Meta = {
    require(bytes != null && bytes.length >= 4, "empty MP3 payload")
    var p = 0
    var n = 0L
    var firstKbps = -1
    var sampleRate = -1
    while (p < bytes.length) {
      require(p + 4 <= bytes.length, s"truncated MP3 header at offset $p")
      require((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0,
        s"broken MP3 sync at offset $p")
      require((bytes(p + 1) & 0x18) == 0x18, "not MPEG-1")
      require((bytes(p + 1) & 0x06) == 0x02, "not Layer III")
      val bi = (bytes(p + 2) >> 4) & 0xf
      val si = (bytes(p + 2) >> 2) & 0x3
      val padding = (bytes(p + 2) >> 1) & 0x1
      require(bi >= 1 && bi <= 14, s"bad bitrate index $bi at offset $p")
      require(si <= 2, s"bad samplerate index $si at offset $p")
      val kbps = Mp3BitrateKbps(bi)
      val sr = Mp3SampleRates(si)
      if (firstKbps < 0) { firstKbps = kbps; sampleRate = sr }
      val frameLen = (144L * kbps * 1000 / sr).toInt + padding
      require(p + frameLen <= bytes.length, s"truncated MP3 frame at offset $p")
      p += frameLen
      n += 1
    }
    Mp3Meta(n, firstKbps, sampleRate, n * Mp3SamplesPerFrame, bytes.length.toLong)
  }

  // --------------------------------------------------------------- H.264

  final case class H264Meta(nNals: Long, nIdr: Long, nNonIdr: Long,
                            nSps: Long, nPps: Long)

  /** Synthesize an H.264 Annex-B byte stream: SPS + PPS, then `gops`
    * groups of one IDR slice + `gopLen − 1` non-IDR slices, each NAL
    * prefixed with the 4-byte start code and filled with 0xAA payload
    * (no accidental start codes / emulation sequences). */
  def buildH264Stream(gops: Int, gopLen: Int, nalPayload: Int = 8): Array[Byte] = {
    require(gops > 0 && gopLen > 0, s"bad GOP shape $gops x $gopLen")
    require(nalPayload >= 1, s"nalPayload must be >= 1, got $nalPayload")
    val bos = new java.io.ByteArrayOutputStream()
    def nal(refIdc: Int, nalType: Int): Unit = {
      bos.write(Array[Byte](0, 0, 0, 1))
      bos.write(((refIdc << 5) | nalType) & 0xff)
      var i = 0
      while (i < nalPayload) { bos.write(0xaa); i += 1 }
    }
    nal(3, 7) // SPS
    nal(3, 8) // PPS
    var g = 0
    while (g < gops) {
      nal(3, 5) // IDR slice
      var s = 1
      while (s < gopLen) { nal(2, 1); s += 1 } // non-IDR slices
      g += 1
    }
    bos.toByteArray
  }

  /** REAL H.264 Annex-B NAL scan: find every 3-/4-byte start code
    * (00 00 01 / 00 00 00 01), read the NAL header's nal_unit_type
    * (low 5 bits), and count units by class — the keyframe/GOP indexing
    * a video pipeline runs before any pixel decode (frame-accurate
    * sharding needs IDR positions, not pixels). Strict: payload before
    * the first start code, a forbidden_zero_bit, or an empty NAL
    * throws. */
  def parseH264Nals(bytes: Array[Byte]): H264Meta = {
    require(bytes != null && bytes.length >= 5, "empty H.264 payload")
    var nNals = 0L; var nIdr = 0L; var nNonIdr = 0L; var nSps = 0L; var nPps = 0L
    var p = 0
    var expectStart = true
    while (p < bytes.length) {
      val four = p + 4 <= bytes.length && bytes(p) == 0 && bytes(p + 1) == 0 &&
        bytes(p + 2) == 0 && bytes(p + 3) == 1
      val three = !four && p + 3 <= bytes.length && bytes(p) == 0 &&
        bytes(p + 1) == 0 && bytes(p + 2) == 1
      if (four || three) {
        val hp = p + (if (four) 4 else 3)
        require(hp < bytes.length, s"empty NAL at offset $p")
        val hdr = bytes(hp) & 0xff
        require((hdr & 0x80) == 0, s"forbidden_zero_bit set at offset $hp")
        (hdr & 0x1f) match {
          case 5 => nIdr += 1
          case 1 => nNonIdr += 1
          case 7 => nSps += 1
          case 8 => nPps += 1
          case _ => ()
        }
        nNals += 1
        expectStart = false
        p = hp + 1
      } else {
        require(!expectStart, "payload before first start code")
        p += 1
      }
    }
    require(nNals > 0, "no NAL units found")
    H264Meta(nNals, nIdr, nNonIdr, nSps, nPps)
  }

  /** Nearest-neighbor resample of a decoded row-major RGB buffer to
    * `dstW`×`dstH`: destination pixel (x, y) copies source pixel
    * (⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋) — the standard index mapping, exact
    * in integer arithmetic (closed-form reproducible, unlike
    * interpolating kernels). */
  def resizeNearest(srcW: Int, srcH: Int, rgb: Array[Byte],
                    dstW: Int, dstH: Int): Array[Byte] = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0,
      s"bad dims ${srcW}x$srcH -> ${dstW}x$dstH")
    require(rgb.length == 3 * srcW * srcH,
      s"rgb length ${rgb.length} != ${3 * srcW * srcH}")
    val out = new Array[Byte](3 * dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * srcH / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * srcW / dstW).toInt
        val sp = 3 * (sy * srcW + sx)
        val dp = 3 * (y * dstW + x)
        out(dp) = rgb(sp); out(dp + 1) = rgb(sp + 1); out(dp + 2) = rgb(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
