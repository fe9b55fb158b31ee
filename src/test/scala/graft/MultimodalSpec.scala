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
}
