package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batch decode /
  * feature-extract / frame-sample operators.
  *
  * Codec status: WAV, BMP, baseline JPEG and PNG decode for REAL —
  * [[MediaCodec]] parses RIFF/PCM WAV and 24-bit BMP in pure JVM code
  * and drives the JDK-bundled `javax.imageio` for JPEG/PNG (see
  * [[audioFeatures]] / [[imageStats]] / [[imageResizeStats]]). MP3 and
  * H.264 get REAL container/frame-level parsing ([[mp3Stats]] /
  * [[h264Stats]]: spec-exact MPEG-1 Layer III frame walks, Annex-B NAL
  * scans — the sharding/indexing metadata pipelines actually need);
  * only their SIGNAL decode (PCM samples, pixels), which the JDK has no
  * decoder for, remains behind [[FakeCodec]], a deterministic
  * byte-level stand-in. Everything Spark-side is real and tested either
  * way: schema, binary handling, `mapPartitions` batch shape (one
  * decoder instance per partition, streamed rows, no per-row setup),
  * partition preservation, and the feature/frame output contracts.
  */
object Multimodal {

  /** Typed media metadata carried alongside the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image/jpeg, audio/wav, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** STUB decoder for the SIGNAL decode the JDK cannot do (MP3 PCM
    * samples, H.264 pixels): deterministic features from raw bytes
    * (byte-value histogram folded into `dim` buckets, L2-normalized).
    * A real codec implements the same (bytes ⇒ float[dim]) contract —
    * WAV/BMP/JPEG/PNG already decode for real via [[MediaCodec]], and
    * MP3/H.264 container parsing is real too ([[mp3Stats]],
    * [[h264Stats]]). */
  object FakeCodec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        acc((bytes(i) & 0xff) % dim) += 1.0
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x * x).sum) max 1.0
      acc.map(x => (x / norm).toFloat)
    }

    /** STUB frame sampler: offsets every `strideBytes` (a real video
      * codec yields keyframe offsets instead). */
    def frameOffsets(bytes: Array[Byte], strideBytes: Int): Seq[Long] =
      if (bytes.isEmpty) Seq.empty
      else 0L.until(bytes.length.toLong, strideBytes.toLong)
  }

  /** Batch feature extraction over a binary column: one decoder per
    * partition, rows streamed through it (the mapInPandas batch shape,
    * JVM-side). Output adds `features: array<float>`. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int,
                      outCol: String = "features"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val outSchema = df.schema.add(StructField(outCol, ArrayType(FloatType, false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup happens HERE (real codecs init once)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val feats = if (bytes == null) null else FakeCodec.features(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (id, frame_no,
    * offset). Real video decode swaps FakeCodec.frameOffsets only. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   strideBytes: Int): DataFrame = {
    require(strideBytes > 0, s"strideBytes must be positive, got $strideBytes")
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else FakeCodec.frameOffsets(bytes, strideBytes).iterator.zipWithIndex
          .map { case (off, no) => (id, no, off) }
      }
    }.toDF(idCol, "frame_no", "byte_offset")
  }

  /** REAL audio decode: parse each row's PCM WAV payload
    * ([[MediaCodec.decodeWav]]) and emit per-clip signal stats. Output:
    * idCol, sample_rate, n_samples, duration_ms, sum_sq (exact integer
    * Σ sample², order-free), rms = sqrt(sum_sq / n). One decoder pass
    * per partition; malformed payloads yield a null row tail rather
    * than failing the job (quarantine by `WHERE sample_rate IS NULL`). */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val (meta, samples) = MediaCodec.decodeWav(bytes)
          var ss = 0L
          var i = 0
          while (i < samples.length) { ss += samples(i).toLong * samples(i); i += 1 }
          val rms =
            if (samples.isEmpty) 0.0
            else math.sqrt(ss.toDouble / samples.length.toDouble)
          (id, Some(meta.sampleRate.toLong), Some(meta.nSamples),
            Some(meta.durationMs), Some(ss), Some(rms))
        } catch {
          // NonFatal, not just IllegalArgumentException: a forged header
          // that slips past validation surfaces as AIOOBE/Arithmetic —
          // still a per-row quarantine, never a job kill
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Double])
        }
      }
    }.toDF(idCol, "sample_rate", "n_samples", "duration_ms", "sum_sq", "rms")
  }

  /** Frame-level audio energy + voice-activity trimming: the
    * VAD/segmentation pre-pass every speech-data pipeline runs before
    * transcription (trim leading/trailing silence, quantify voiced
    * content). Each clip's PCM samples tile into `frameLen`-sample
    * frames (tail partial frame included); a frame is VOICED when its
    * mean square exceeds `meanSqThreshold` — compared as the exact
    * integer inequality Σs² > thr·n, no float division, so the verdict
    * is oracle-replayable bit for bit.
    *
    * Output per clip: n_frames, n_voiced, first_voiced / last_voiced
    * (frame indices, −1 when silent), kept_samples and kept_sum_sq over
    * the trimmed [first, last] frame range, kept_ms (truncating integer
    * division by the sample rate). Decoder errors quarantine as null
    * rows ([[audioFeatures]] contract). Per-partition sequential decode
    * — one pass, no shuffle at any corpus size. */
  def audioVad(df: DataFrame, idCol: String, binCol: String,
               frameLen: Int, meanSqThreshold: Long): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val (meta, samples) = MediaCodec.decodeWav(bytes)
          val nFrames = (samples.length + frameLen - 1) / frameLen
          var first = -1L
          var last = -1L
          var nVoiced = 0L
          var f = 0
          while (f < nFrames) {
            val lo = f * frameLen
            val hi = math.min(lo + frameLen, samples.length)
            var ss = 0L
            var i = lo
            while (i < hi) { ss += samples(i).toLong * samples(i); i += 1 }
            if (ss > meanSqThreshold * (hi - lo)) {
              if (first < 0) first = f
              last = f
              nVoiced += 1
            }
            f += 1
          }
          var keptSamples = 0L
          var keptSumSq = 0L
          if (first >= 0) {
            val lo = first.toInt * frameLen
            val hi = math.min((last.toInt + 1) * frameLen, samples.length)
            keptSamples = (hi - lo).toLong
            var i = lo
            while (i < hi) { keptSumSq += samples(i).toLong * samples(i); i += 1 }
          }
          val keptMs = keptSamples * 1000L / meta.sampleRate
          (id, Some(nFrames.toLong), Some(nVoiced), Some(first), Some(last),
            Some(keptSamples), Some(keptSumSq), Some(keptMs))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long])
        }
      }
    }.toDF(idCol, "n_frames", "n_voiced", "first_voiced", "last_voiced",
      "kept_samples", "kept_sum_sq", "kept_ms")
  }

  /** REAL image decode: parse each row's image payload — 24-bit BMP,
    * baseline JPEG, or PNG, sniffed by magic
    * ([[MediaCodec.decodeImage]]) — and
    * emit dimensions + exact integer luminance sum (Σ r+g+b —
    * order-free) and mean channel value. Malformed payloads yield
    * nulls, as in [[audioFeatures]]. */
  /** Image quality metrics for corpus filtering — the blur/contrast
    * screen an image-curation pipeline runs before training (the
    * LAION-style quality gate): per-pixel luminance lum = r+g+b (the
    * [[imageStats]] convention, exact 0..765 ints), and
    *
    *  - lum_sum, lum_sq_sum: exact BIGINT Σlum, Σlum² — contrast =
    *    variance derives as (n·Σx² − (Σx)²)/n², all-integer until one
    *    final division,
    *  - lap_sum: Σ over INTERIOR pixels |4·p − left − right − up −
    *    down| — the 4-neighbor Laplacian magnitude, the standard
    *    variance-of-Laplacian blur detector's exact-integer core (a
    *    blurred image has small |∇²|),
    *  - n_px, n_interior: the denominators, so any normalization is
    *    caller-side and exact.
    *
    * All outputs are order-free exact integer sums — oracle-replayable
    * bit for bit from a closed-form pixel fixture. Malformed payloads
    * quarantine as null rows. */
  def imageQuality(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val (w, h, rgb) = MediaCodec.decodeImage(bytes)
          val lum = new Array[Int](w * h)
          var i = 0
          while (i < lum.length) {
            val p = 3 * i
            lum(i) = (rgb(p) & 0xff) + (rgb(p + 1) & 0xff) + (rgb(p + 2) & 0xff)
            i += 1
          }
          var s = 0L
          var sq = 0L
          i = 0
          while (i < lum.length) {
            s += lum(i); sq += lum(i).toLong * lum(i); i += 1
          }
          var lap = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val c = y * w + x
              val d = 4L * lum(c) - lum(c - 1) - lum(c + 1) -
                lum(c - w) - lum(c + w)
              lap += math.abs(d)
              x += 1
            }
            y += 1
          }
          val nInt = if (w >= 3 && h >= 3) (w - 2).toLong * (h - 2) else 0L
          (id, Some(w.toLong), Some(h.toLong), Some((w.toLong * h)),
            Some(s), Some(sq), Some(lap), Some(nInt))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long])
        }
      }
    }.toDF(idCol, "w", "h", "n_px", "lum_sum", "lum_sq_sum", "lap_sum",
      "n_interior")
  }

  def imageStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val (w, h, rgb) = MediaCodec.decodeImage(bytes)
          var s = 0L
          var i = 0
          while (i < rgb.length) { s += (rgb(i) & 0xff); i += 1 }
          (id, Some(w.toLong), Some(h.toLong), Some(s),
            Some(s.toDouble / rgb.length.toDouble))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Double])
        }
      }
    }.toDF(idCol, "width", "height", "lum_sum", "mean_channel")
  }

  /** REAL image resize: decode each row's payload (BMP/JPEG/PNG by
    * magic), nearest-neighbor resample to `dstW`×`dstH`
    * ([[MediaCodec.resizeNearest]]), and emit the resized dimensions +
    * luminance stats — the thumbnail/normalize step of a multimodal
    * training pipeline, with the same per-partition batch shape and
    * malformed-payload-to-null quarantine as [[imageStats]]. Stats
    * rather than re-encoded bytes keep the result oracle-checkable;
    * callers wanting the payload compose [[MediaCodec.resizeNearest]]
    * with an encoder in the same partition pass. */
  def imageResizeStats(df: DataFrame, idCol: String, binCol: String,
                       dstW: Int, dstH: Int): DataFrame = {
    require(dstW > 0 && dstH > 0, s"bad target dims ${dstW}x$dstH")
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val (w, h, rgb) = MediaCodec.decodeImage(bytes)
          val out = MediaCodec.resizeNearest(w, h, rgb, dstW, dstH)
          var s = 0L
          var i = 0
          while (i < out.length) { s += (out(i) & 0xff); i += 1 }
          (id, Some(dstW.toLong), Some(dstH.toLong), Some(s),
            Some(s.toDouble / out.length.toDouble))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Double])
        }
      }
    }.toDF(idCol, "width", "height", "lum_sum", "mean_channel")
  }

  /** REAL perceptual difference-hash (dHash, Krawetz 2013): decode each
    * row's image payload (BMP/JPEG/PNG by magic), nearest-neighbor
    * resample to a (gw+1)×gh thumbnail ([[MediaCodec.resizeNearest]]),
    * and hash the horizontal luminance gradients — bit `y·gw + x` is set
    * iff `lum(x+1, y) > lum(x, y)`, where lum is the integer channel sum
    * r+g+b of the resampled pixel (monotone in the mean, no division).
    * The default 8×7 grid yields a 56-bit hash: deliberately under 64
    * bits so the value stays in the NON-NEGATIVE long range and every
    * downstream comparison (banding shifts, XOR popcount, cross-engine
    * oracle SQL) is exact signed-integer arithmetic with no sign-bit
    * special-casing. Output: idCol, dhash (bigint, null for malformed
    * payloads — same quarantine as [[imageStats]]).
    *
    * Near-duplicate images (re-encodes, small edits, brightness shifts
    * that preserve gradient signs) land within a small Hamming distance;
    * pair generation at corpus scale is [[Dedup.hammingNearDupPairs]]'
    * banded inverted-index join, never all-pairs. */
  def imageDHash(df: DataFrame, idCol: String, binCol: String,
                 gw: Int = 8, gh: Int = 7): DataFrame = {
    require(gw >= 1 && gh >= 1, s"bad dhash grid ${gw}x$gh")
    require(gw * gh < 64, s"dhash grid ${gw}x$gh needs ${gw * gh} bits; " +
      "must stay under 64 so the hash fits the non-negative long range")
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val (w, h, rgb) = MediaCodec.decodeImage(r.getAs[Array[Byte]](binIdx))
          val t = MediaCodec.resizeNearest(w, h, rgb, gw + 1, gh)
          var hash = 0L
          var y = 0
          while (y < gh) {
            var x = 0
            while (x < gw) {
              val p0 = 3 * (y * (gw + 1) + x)
              val l0 = (t(p0) & 0xff) + (t(p0 + 1) & 0xff) + (t(p0 + 2) & 0xff)
              val l1 = (t(p0 + 3) & 0xff) + (t(p0 + 4) & 0xff) + (t(p0 + 5) & 0xff)
              if (l1 > l0) hash |= 1L << (y * gw + x)
              x += 1
            }
            y += 1
          }
          (id, Some(hash))
        } catch {
          case scala.util.control.NonFatal(_) => (id, None: Option[Long])
        }
      }
    }.toDF(idCol, "dhash")
  }

  /** REAL MP3 container parse: walk each row's MPEG-1 Layer III frame
    * stream ([[MediaCodec.parseMp3Frames]]) and emit frame/duration
    * stats — the shard-planning metadata an audio pipeline needs before
    * (and usually instead of) sample decode. duration_ms is exact
    * integer arithmetic: n_samples·1000 / rate, floored. Malformed
    * payloads yield nulls (same quarantine as [[audioFeatures]]). */
  def mp3Stats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val m = MediaCodec.parseMp3Frames(r.getAs[Array[Byte]](binIdx))
          (id, Some(m.nFrames), Some(m.bitrateKbps.toLong),
            Some(m.sampleRate.toLong), Some(m.nSamples),
            Some(m.nSamples * 1000L / m.sampleRate), Some(m.totalBytes))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long])
        }
      }
    }.toDF(idCol, "n_frames", "bitrate_kbps", "sample_rate", "n_samples",
      "duration_ms", "total_bytes")
  }

  /** REAL H.264 Annex-B NAL scan: count NAL units by class per row
    * ([[MediaCodec.parseH264Nals]]) — keyframe (IDR) indexing for
    * frame-accurate video sharding, no pixel decode involved. Malformed
    * payloads yield nulls. */
  def h264Stats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val m = MediaCodec.parseH264Nals(r.getAs[Array[Byte]](binIdx))
          (id, Some(m.nNals), Some(m.nIdr), Some(m.nNonIdr), Some(m.nSps),
            Some(m.nPps))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long])
        }
      }
    }.toDF(idCol, "n_nals", "n_idr", "n_nonidr", "n_sps", "n_pps")
  }

  /** Wrap a text table as a multimodal fixture (text bytes as payload) —
    * lets the plumbing run against the driver testdata, which has no
    * binary tables. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast(BinaryType).as("media"),
      struct(
        lit("text/plain").as("media_type"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        length(col(textCol)).cast(LongType).as("duration_ms")).as("media_meta"))
}
