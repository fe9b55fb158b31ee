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
