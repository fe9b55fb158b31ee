package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ingest: micro-batch upsert with exactly-once snapshot
  * publish, threshold flush (B10), and watermarked windowed aggregation. */
class StreamingSpec extends SparkSpec {

  test("upsert stream applies micro-batches; updates win; flush fires at threshold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = Files.createTempDirectory("stream").toString
    val flushes = new java.util.concurrent.atomic.AtomicInteger(0)

    val source = MemoryStream[(Long, String)]
    source.addData((0L, "a"), (1L, "b"))
    val q1 = StreamingIngest.upsertStream(
      source.toDF().toDF("id", "v"), "id", s"$tmp/snap", s"$tmp/ckpt1",
      flushThreshold = 3, onFlush = _ => { flushes.incrementAndGet(); () })
    q1.awaitTermination()

    var snap = s.read.parquet(s"$tmp/snap").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(snap.toSeq == Seq(0L -> "a", 1L -> "b"))
    assert(flushes.get() == 0) // 2 rows < threshold 3

    source.addData((1L, "B"), (2L, "c"))
    val q2 = StreamingIngest.upsertStream(
      source.toDF().toDF("id", "v"), "id", s"$tmp/snap", s"$tmp/ckpt1",
      flushThreshold = 3, onFlush = _ => { flushes.incrementAndGet(); () })
    q2.awaitTermination()

    snap = s.read.parquet(s"$tmp/snap").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(snap.toSeq == Seq(0L -> "a", 1L -> "B", 2L -> "c"))
    assert(flushes.get() == 1) // 2 + 2 rows >= threshold
  }

  test("windowed counts with watermark match the batch rollup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    source.addData(
      (ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
      (ts(10, 50), "view", 3.0), (ts(11, 10), "click", 4.0))
    val agg = StreamingIngest.windowedCounts(
      source.toDF().toDF("ts", "event_type", "value"), "ts", "event_type")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = s.sql("SELECT event_type, n, sum_value FROM wc ORDER BY event_type, n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSet == Set(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 3.0)))
  }
}
