package graft

import graft.core.SnapshotIO
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.file.Files

/** Crash-safety contract of the snapshot publish: at every crash point
  * read() recovers a complete snapshot — never "first batch" amnesia. */
class SnapshotIOSpec extends SparkSpec {

  private def fs: FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def write(dst: String, rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    SnapshotIO.publish(rows.toDF("id", "v"), dst)
  }

  private def readIds(dst: String): Option[Seq[Long]] =
    SnapshotIO.read(spark, dst).map(_.select("id").collect().map(_.getLong(0)).toSeq.sorted)

  test("publish/read round-trip; fresh store reads None") {
    val dst = Files.createTempDirectory("snap").toString + "/t"
    assert(SnapshotIO.read(spark, dst).isEmpty)
    write(dst, Seq(1L -> "a", 2L -> "b"))
    assert(readIds(dst).contains(Seq(1L, 2L)))
    write(dst, Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(readIds(dst).contains(Seq(1L, 2L, 3L)))
    // no stray tmp/bak left behind after a clean publish
    assert(!fs.exists(new Path(dst + ".tmp")) && !fs.exists(new Path(dst + ".bak")))
  }

  test("compactFiles: many small files merge to few, content identical, crash-safe") {
    val s = spark
    import s.implicits._
    val dst = Files.createTempDirectory("snapc").toString + "/t"
    // fresh store: nothing to compact
    assert(SnapshotIO.compactFiles(spark, dst) == 0L)
    // publish 32 tiny files (the post-streaming-ingest shape)
    SnapshotIO.publish(
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(32), dst)
    val before = fs.listStatus(new Path(dst))
      .count(f => f.getPath.getName.endsWith(".parquet"))
    assert(before == 32, s"expected 32 small files, got $before")
    val want = SnapshotIO.read(spark, dst).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // a generous target ⇒ one file
    assert(SnapshotIO.compactFiles(spark, dst) == 1L)
    val after = fs.listStatus(new Path(dst))
      .count(f => f.getPath.getName.endsWith(".parquet"))
    assert(after == 1, s"expected 1 compacted file, got $after")
    val got = SnapshotIO.read(spark, dst).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    // clean rename protocol: no stray tmp/bak
    assert(!fs.exists(new Path(dst + ".tmp")) && !fs.exists(new Path(dst + ".bak")))
    // merge-only contract: a tiny target on an already-single-file
    // snapshot is a no-op (coalesce cannot split; splitting is a
    // shuffle and a layout decision)
    assert(SnapshotIO.compactFiles(spark, dst, targetBytes = 4096L) == 1L)
    val still = fs.listStatus(new Path(dst))
      .count(f => f.getPath.getName.endsWith(".parquet"))
    assert(still == 1)
    assert(SnapshotIO.read(spark, dst).get.count() == 1000L)
  }

  test("crash after rename-aside (dst missing, tmp complete) promotes tmp") {
    val dst = Files.createTempDirectory("snap").toString + "/t"
    write(dst, Seq(1L -> "old"))
    // simulate: new tmp fully written, dst renamed aside, crash before tmp→dst
    val s = spark
    import s.implicits._
    Seq(1L -> "old", 2L -> "new").toDF("id", "v")
      .write.mode("overwrite").parquet(dst + ".tmp")
    assert(fs.rename(new Path(dst), new Path(dst + ".bak")))
    assert(readIds(dst).contains(Seq(1L, 2L))) // tmp (newer state) promoted
    assert(!fs.exists(new Path(dst + ".bak")))
  }

  test("crash before tmp completes (dst renamed aside, tmp partial) restores bak") {
    val dst = Files.createTempDirectory("snap").toString + "/t"
    write(dst, Seq(1L -> "old"))
    // simulate: tmp dir exists but has no _SUCCESS (torn write), dst aside
    fs.mkdirs(new Path(dst + ".tmp"))
    assert(fs.rename(new Path(dst), new Path(dst + ".bak")))
    assert(readIds(dst).contains(Seq(1L))) // previous snapshot restored
  }
}
