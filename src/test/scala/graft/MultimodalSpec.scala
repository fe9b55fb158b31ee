package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, per-partition batch
  * decode (stubbed codec, real batch shape), frame sampling. */
class MultimodalSpec extends SparkSpec {

  private def media = {
    val s = spark
    import s.implicits._
    Multimodal.asMediaTable(
      Seq((0L, "hello world"), (1L, "hello world"), (2L, "zzzzzz"))
        .toDF("id", "text"),
      "id", "text")
  }

  test("media table carries binary payload + typed metadata") {
    val r = media.select("id", "media", "media_meta.media_type", "media_meta.duration_ms")
      .orderBy("id").collect()
    assert(r(0).getAs[Array[Byte]]("media").sameElements("hello world".getBytes))
    assert(r(0).getString(2) == "text/plain")
    assert(r(2).getLong(3) == 6L)
  }

  test("feature extraction: deterministic, normalized, schema-preserving") {
    val f = Multimodal.extractFeatures(media, "media", dim = 16)
    assert(f.schema.fieldNames.toSeq ==
      media.schema.fieldNames.toSeq :+ "features")
    val feats = f.select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 16))
    assert(feats(0L) == feats(1L)) // same bytes ⇒ same features
    assert(feats(0L) != feats(2L))
    val norm = math.sqrt(feats(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("frame sampling emits stride-spaced offsets per row") {
    val frames = Multimodal.sampleFrames(media, "id", "media", strideBytes = 4)
      .filter(col("id") === 0).orderBy("frame_no").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(frames.toSeq == Seq((0, 0L), (1, 4L), (2, 8L))) // 11 bytes / stride 4
  }

  test("WAV codec: 8/16-bit round-trip, aux-chunk walking, strict errors") {
    import graft.operators.MediaCodec
    // 8-bit: stored unsigned, decoded centered
    val (m8, s8) = MediaCodec.decodeWav(
      MediaCodec.encodeWav(Array[Byte](0, 127.toByte, 128.toByte, 255.toByte), 8000))
    assert(m8 == MediaCodec.WavMeta(8000, 1, 8, 4L))
    assert(s8.toSeq == Seq(-128, -1, 0, 127))
    assert(m8.durationMs == 0L) // 4 samples @8kHz floors to 0 ms
    // 16-bit LE signed
    val pcm16 = Array[Byte](0x34, 0x12, 0xff.toByte, 0xff.toByte) // 0x1234, -1
    val (m16, s16) = MediaCodec.decodeWav(
      MediaCodec.encodeWav(pcm16, 44100, bitsPerSample = 16))
    assert(m16.bitsPerSample == 16 && m16.nSamples == 2L)
    assert(s16.toSeq == Seq(0x1234, -1))
    // an auxiliary chunk between fmt and data is skipped, not fatal
    val w = MediaCodec.encodeWav(Array[Byte](130.toByte), 8000)
    val aux = Array[Byte]('L', 'I', 'S', 'T', 2, 0, 0, 0, 7, 7)
    val spliced = w.take(36) ++ aux ++ w.drop(36)
    // patch RIFF size for the extra 10 bytes
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte; spliced(5) = ((riffLen >> 8) & 0xff).toByte
    assert(MediaCodec.decodeWav(spliced)._2.toSeq == Seq(2))
    intercept[IllegalArgumentException](MediaCodec.decodeWav("junk!junk".getBytes))
    // forged headers fail validation instead of reading out of bounds:
    // a truncated trailing fmt chunk (declared len 4)…
    val shortFmt = ("RIFF".getBytes :+ 36.toByte :+ 0.toByte :+ 0.toByte :+ 0.toByte) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++ Array[Byte](4, 0, 0, 0) ++
      Array.fill[Byte](24)(0)
    intercept[IllegalArgumentException](MediaCodec.decodeWav(shortFmt))
    // …zero channels…
    val w0 = MediaCodec.encodeWav(Array[Byte](1), 8000)
    w0(22) = 0
    intercept[IllegalArgumentException](MediaCodec.decodeWav(w0))
    // …a forged chunk length near Int.MaxValue must hit the bound check
    // (long arithmetic), not wrap negative and read out of bounds
    val huge = MediaCodec.encodeWav(Array[Byte](1), 8000)
    huge(40) = 0xf0.toByte; huge(41) = 0xff.toByte
    huge(42) = 0xff.toByte; huge(43) = 0x7f.toByte // data len = 0x7ffffff0
    intercept[IllegalArgumentException](MediaCodec.decodeWav(huge))
    // …and a BMP with a negative pixel offset or forged huge width
    val bmp = MediaCodec.encodeBmp(2, 2, Array.fill[Byte](12)(1))
    val badOff = bmp.clone(); badOff(13) = 0x80.toByte // pixelOff < 0
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badOff))
    val badW = bmp.clone(); badW(21) = 0x40.toByte // width ~2^30, overflows 3wh
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badW))
  }

  test("BMP codec: round-trip through row padding; imageStats/audioFeatures real decode") {
    import graft.operators.MediaCodec
    val s = spark
    import s.implicits._
    // 3x2 : rowBytes pads 9 → 12; round-trip must be exact
    val rgb = Array.tabulate(18)(i => (i * 7).toByte)
    val (w, h, back) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(3, 2, rgb))
    assert(w == 3 && h == 2 && back.toSeq == rgb.toSeq)
    val imgs = Seq((1L, MediaCodec.encodeBmp(3, 2, rgb)),
      (2L, "notbmp".getBytes)).toDF("id", "media")
    val st = Multimodal.imageStats(imgs, "id", "media").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getLong(1) == 3L && st(1L).getLong(2) == 2L)
    assert(st(1L).getLong(3) == rgb.map(_ & 0xff).sum.toLong)
    assert(st(2L).isNullAt(1) && st(2L).isNullAt(4)) // quarantined, not fatal
    val wavs = Seq((1L, MediaCodec.encodeWav(Array[Byte](131.toByte, 124.toByte), 8000)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    val af = Multimodal.audioFeatures(wavs, "id", "media").collect()
      .map(r => r.getLong(0) -> r).toMap
    // samples +3, -4 → sum_sq 25, rms sqrt(12.5)
    assert(af(1L).getLong(4) == 25L)
    assert(af(1L).getDouble(5) == math.sqrt(12.5))
    assert(af(2L).isNullAt(1))
  }

  /** The block-constant grayscale fixture mm_jpeg_decode generates:
    * every pixel of 8×8 block (bx, by) holds gray value
    * (seed·31 + bx·7 + by·13) mod 256. */
  private def blockGray(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((seed * 31 + (x / 8) * 7 + (y / 8) * 13) % 256).toByte
      val p = 3 * (y * w + x)
      rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
    }
    rgb
  }

  test("JPEG codec: block-constant grayscale round-trips BIT-EXACTLY at quality 1.0") {
    import graft.operators.MediaCodec
    // the exactness mm_jpeg_decode's oracle relies on: all-ones quant
    // tables (q=1.0) + DC-only blocks + constant chroma — including
    // non-multiple-of-8 dims (edge-replicated partial blocks stay
    // constant) and every block-value phase
    for (seed <- Seq(0L, 1L, 7L, 255L); (w, h) <- Seq((24, 16), (27, 19), (8, 8), (3, 5))) {
      val rgb = blockGray(seed, w, h)
      val (dw, dh, back) = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(w, h, rgb, 1.0f))
      assert(dw == w && dh == h, s"dims drifted for seed=$seed ${w}x$h")
      assert(back.toSeq == rgb.toSeq, s"JPEG round-trip not exact for seed=$seed ${w}x$h")
    }
  }

  test("JPEG codec: lossy content decodes within a small bounded error; strict on garbage") {
    import graft.operators.MediaCodec
    // smooth gradient (non-block-constant): decode must stay close at
    // high quality — this pins that the codec path is a REAL lossy
    // decoder, not an identity stub
    val w = 32; val h = 24
    val rgb = Array.tabulate(3 * w * h) { p =>
      val i = p / 3; ((i % w) * 3 + (i / w) * 2).toByte
    }
    val (dw, dh, back) = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(w, h, rgb, 0.95f))
    assert(dw == w && dh == h)
    val maxErr = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - (back(i) & 0xff))).max
    assert(maxErr <= 16, s"gradient decode error $maxErr out of bounds")
    assert(maxErr >= 0) // sanity
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg("nope".getBytes))
    // JPEG magic but an undecodable body must throw, not return junk
    intercept[Exception](
      MediaCodec.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01)))
  }

  test("PNG codec: ARBITRARY content round-trips bit-exactly (lossless); strict on garbage") {
    import graft.operators.MediaCodec
    val rnd = new scala.util.Random(9)
    for ((w, h) <- Seq((17, 9), (1, 1), (32, 24))) {
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val (dw, dh, back) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, rgb))
      assert(dw == w && dh == h)
      assert(back.toSeq == rgb.toSeq, s"PNG round-trip not exact for ${w}x$h")
    }
    intercept[IllegalArgumentException](MediaCodec.decodePng("nope".getBytes))
    // PNG signature with an undecodable body must throw, not return junk
    intercept[Exception](MediaCodec.decodePng(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0x00)))
  }

  test("resizeNearest: index mapping exact; identity resize is a copy; downscale picks floors") {
    import graft.operators.MediaCodec
    // 4x2 source, distinct per-pixel values
    val src = Array.tabulate(24)(i => i.toByte)
    assert(MediaCodec.resizeNearest(4, 2, src, 4, 2).toSeq == src.toSeq)
    // 2x1 target: dst(0,0) <- src(0,0), dst(1,0) <- src(2,0)
    val down = MediaCodec.resizeNearest(4, 2, src, 2, 1)
    assert(down.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
    // upscale 1x1 -> 3x3 replicates the single pixel
    val up = MediaCodec.resizeNearest(1, 1, Array[Byte](5, 6, 7), 3, 3)
    assert(up.length == 27 && up.grouped(3).forall(_.toSeq == Seq[Byte](5, 6, 7)))
    // resized stats pipeline: PNG in, 16x12 out, lum matches a direct replay
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val w = 21; val h = 15
    val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
    val expected = {
      val out = MediaCodec.resizeNearest(w, h, rgb, 16, 12)
      out.map(_ & 0xff).map(_.toLong).sum
    }
    val df = Seq((1L, MediaCodec.encodePng(w, h, rgb))).toDF("id", "media")
    val st = Multimodal.imageResizeStats(df, "id", "media", 16, 12).collect().head
    assert(st.getLong(1) == 16L && st.getLong(2) == 12L && st.getLong(3) == expected)
  }

  test("MP3 frame walk: spec-exact frame hops, CBR stats; strict on broken sync/truncation") {
    import graft.operators.MediaCodec
    // 128 kbps (idx 9) @ 44100: frame = 144*128000/44100 = 417 bytes
    val stream = MediaCodec.buildMp3(nFrames = 5, bitrateIdx = 9)
    assert(stream.length == 5 * 417)
    val m = MediaCodec.parseMp3Frames(stream)
    assert(m.nFrames == 5 && m.bitrateKbps == 128 && m.sampleRate == 44100)
    assert(m.nSamples == 5 * 1152 && m.totalBytes == 5 * 417)
    // 48 kHz index changes the hop length: 144*320000/48000 = 960
    val hi = MediaCodec.parseMp3Frames(
      MediaCodec.buildMp3(nFrames = 2, bitrateIdx = 14, sampleRateIdx = 1))
    assert(hi.sampleRate == 48000 && hi.totalBytes == 2 * 960)
    intercept[IllegalArgumentException](
      MediaCodec.parseMp3Frames("garbage!".getBytes))
    // valid first frame, then truncated second header
    intercept[IllegalArgumentException](
      MediaCodec.parseMp3Frames(stream.take(417 + 2)))
    // broken sync mid-stream
    val broken = stream.clone(); broken(417) = 0x00
    intercept[IllegalArgumentException](MediaCodec.parseMp3Frames(broken))
  }

  test("H.264 NAL scan: GOP census by type, 3- and 4-byte start codes; strict on junk") {
    import graft.operators.MediaCodec
    val st = MediaCodec.buildH264Stream(gops = 3, gopLen = 4)
    val m = MediaCodec.parseH264Nals(st)
    assert(m.nNals == 2 + 3 * 4 && m.nIdr == 3 && m.nNonIdr == 3 * 3)
    assert(m.nSps == 1 && m.nPps == 1)
    // hand-built stream with a 3-byte start code variant
    val three = Array[Byte](0, 0, 1, 0x65.toByte, 0xaa.toByte, // IDR (ref 3, type 5)
      0, 0, 0, 1, 0x41.toByte, 0xaa.toByte)                    // non-IDR
    val m3 = MediaCodec.parseH264Nals(three)
    assert(m3.nNals == 2 && m3.nIdr == 1 && m3.nNonIdr == 1)
    intercept[IllegalArgumentException](
      MediaCodec.parseH264Nals("no start code here".getBytes))
    // forbidden_zero_bit set in the NAL header
    intercept[IllegalArgumentException](MediaCodec.parseH264Nals(
      Array[Byte](0, 0, 0, 1, 0x85.toByte, 0xaa.toByte)))
    // distributed stats path with a malformed row quarantined
    val s = spark
    import s.implicits._
    val df = Seq((1L, st), (2L, "junk".getBytes)).toDF("id", "media")
    val rows = Multimodal.h264Stats(df, "id", "media").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 14L && rows(2L).isNullAt(1))
  }

  test("imageDHash: gradient-sign hash, brightness-invariant, null quarantine") {
    import graft.operators.MediaCodec
    val s = spark
    import s.implicits._
    // 9×7 source = identity resample for the default 8×7 grid, so the
    // hash is hand-computable: strictly increasing rows ⇒ all 56 bits
    def ramp(off: Int) = Array.tabulate(3 * 9 * 7) { p =>
      val x = (p / 3) % 9
      (off + x * 10).toByte
    }
    val flat = Array.fill(3 * 9 * 7)(77.toByte)
    val imgs = Seq(
      (1L, MediaCodec.encodePng(9, 7, ramp(0))),
      (2L, MediaCodec.encodePng(9, 7, ramp(20))), // brightness-shifted copy
      (3L, MediaCodec.encodePng(9, 7, flat)),     // no gradients
      (4L, "not-an-image".getBytes)).toDF("id", "media")
    val h = Multimodal.imageDHash(imgs, "id", "media").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(h(1L).contains((1L << 56) - 1L), s"ramp hash ${h(1L)}")
    assert(h(2L) == h(1L), "perceptual hash must survive a brightness shift")
    assert(h(3L).contains(0L))
    assert(h(4L).isEmpty)
    // a single-pixel edit moves the hash by at most 2 bits
    val dent = ramp(0).clone()
    val dp = 3 * (3 * 9 + 4) // pixel (4, 3)
    dent(dp) = 0; dent(dp + 1) = 0; dent(dp + 2) = 0
    val h2 = Multimodal.imageDHash(
      Seq((9L, MediaCodec.encodePng(9, 7, dent))).toDF("id", "media"),
      "id", "media").collect()(0).getLong(1)
    assert(java.lang.Long.bitCount(h2 ^ h(1L).get) <= 2)
    // grids that would spill into the sign bit are rejected up front
    intercept[IllegalArgumentException] {
      Multimodal.imageDHash(imgs, "id", "media", gw = 8, gh = 8)
    }
  }

  test("imageStats dispatches BMP and JPEG by magic in one mixed column") {
    import graft.operators.MediaCodec
    val s = spark
    import s.implicits._
    val bmpRgb = Array.tabulate(27)(i => (i * 5).toByte) // 3x3
    val jpgRgb = blockGray(3L, 16, 8)
    val imgs = Seq(
      (1L, MediaCodec.encodeBmp(3, 3, bmpRgb)),
      (2L, MediaCodec.encodeJpeg(16, 8, jpgRgb, 1.0f)),
      (3L, "garbage-payload".getBytes)).toDF("id", "media")
    val st = Multimodal.imageStats(imgs, "id", "media").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getLong(1) == 3L && st(1L).getLong(3) == bmpRgb.map(_ & 0xff).sum.toLong)
    assert(st(2L).getLong(1) == 16L && st(2L).getLong(2) == 8L)
    assert(st(2L).getLong(3) == jpgRgb.map(_ & 0xff).sum.toLong) // exact: block-constant q=1.0
    assert(st(3L).isNullAt(1) && st(3L).isNullAt(4))
  }

  test("imageQuality: exact contrast sums, Laplacian on a hand image, flat = 0") {
    import graft.operators.MediaCodec
    val s = spark
    import s.implicits._
    // 3×3 grayscale ramp: gray g(x,y) = 10·(y·3+x) → lum = 3·g
    val ramp = Array.tabulate(27) { i =>
      val px = i / 3
      (10 * px).toByte
    }
    val flat = Array.fill(27)(50.toByte)
    val imgs = Seq(
      (1L, MediaCodec.encodeBmp(3, 3, ramp)),
      (2L, MediaCodec.encodeBmp(3, 3, flat)),
      (3L, "junk".getBytes)).toDF("id", "media")
    val out = Multimodal.imageQuality(imgs, "id", "media").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    val lums = (0 until 9).map(i => 3 * 10 * i)
    assert(r1.getAs[Long]("n_px") == 9L)
    assert(r1.getAs[Long]("lum_sum") == lums.sum.toLong)
    assert(r1.getAs[Long]("lum_sq_sum") == lums.map(v => v.toLong * v).sum)
    // single interior pixel (1,1): |4·c − l − r − u − d| with
    // c=lum(4)=120, l=90, r=150, u=30, d=210 → |480−480| = 0 for the
    // linear ramp — so use the exact value the formula gives
    assert(r1.getAs[Long]("n_interior") == 1L)
    assert(r1.getAs[Long]("lap_sum") ==
      math.abs(4L * lums(4) - lums(3) - lums(5) - lums(1) - lums(7)))
    val r2 = out(2L) // constant image: zero Laplacian, zero variance
    assert(r2.getAs[Long]("lap_sum") == 0L)
    assert(9L * r2.getAs[Long]("lum_sq_sum") ==
      r2.getAs[Long]("lum_sum") * r2.getAs[Long]("lum_sum"))
    assert(out(3L).isNullAt(1)) // quarantine
  }

  test("audioVad: silence trim window, integer threshold verdict, quarantine") {
    import graft.operators.MediaCodec
    val s = spark
    import s.implicits._
    // 4-sample frames: [silence][loud][loud][tail-silence(2)] — 8-bit
    // PCM stores sample+128, so 128 encodes 0 and 128±a encodes ±a
    def pcm(vals: Int*): Array[Byte] = vals.map(v => (v + 128).toByte).toArray
    val clip = pcm(0, 0, 0, 0, 50, 50, 50, 50, -60, 60, -60, 60, 1, 1)
    val silent = pcm(1, -1, 1, -1)
    val wavs = Seq(
      (1L, MediaCodec.encodeWav(clip, 8000)),
      (2L, MediaCodec.encodeWav(silent, 8000)),
      (3L, "noise".getBytes)).toDF("id", "media")
    val out = Multimodal.audioVad(wavs, "id", "media",
      frameLen = 4, meanSqThreshold = 100L).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4L) // 14 samples → 4 frames (tail of 2)
    assert(r1.getLong(2) == 2L) // frames 1, 2 voiced (2500, 3600 > 100)
    assert(r1.getLong(3) == 1L && r1.getLong(4) == 2L)
    assert(r1.getLong(5) == 8L) // trimmed to frames 1..2
    assert(r1.getLong(6) == 4L * 2500L + 4L * 3600L)
    assert(r1.getLong(7) == 8L * 1000L / 8000L)
    val r2 = out(2L) // wholly silent: mean sq 1 ≤ 100
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 0L)
    assert(r2.getLong(3) == -1L && r2.getLong(4) == -1L && r2.getLong(5) == 0L)
    assert(out(3L).isNullAt(1)) // malformed payload quarantined
  }
}
