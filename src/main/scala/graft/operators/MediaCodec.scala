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
