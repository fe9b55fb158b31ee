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

  private def writeRetained(dst: String, rows: Seq[(Long, String)],
                            retain: Int): Unit = {
    val s = spark
    import s.implicits._
    SnapshotIO.publishRetained(rows.toDF("id", "v"), dst, retain)
  }

  private def genVals(dst: String, g: Long): Seq[String] =
    SnapshotIO.readGeneration(spark, dst, g).get
      .select("v").collect().map(_.getString(0)).toSeq.sorted

  test("publishRetained: retention window, generation content, monotone numbering") {
    val dst = Files.createTempDirectory("snapg").toString + "/t"
    (1 to 5).foreach(i => writeRetained(dst, Seq(i.toLong -> s"v$i"), retain = 2))
    // live snapshot = v5; newest 2 displaced snapshots = v3 (gen 2), v4 (gen 3)
    assert(readIds(dst).contains(Seq(5L)))
    assert(SnapshotIO.generations(spark, dst) == Seq(2L, 3L))
    assert(genVals(dst, 2L) == Seq("v3"))
    assert(genVals(dst, 3L) == Seq("v4"))
    assert(SnapshotIO.readGeneration(spark, dst, 0L).isEmpty) // vacuumed
    // another publish slides the window; numbering keeps growing
    writeRetained(dst, Seq(6L -> "v6"), retain = 2)
    assert(SnapshotIO.generations(spark, dst) == Seq(3L, 4L))
    assert(genVals(dst, 4L) == Seq("v5"))
    // clean protocol: no stray tmp/arch
    assert(!fs.exists(new Path(dst + ".tmp")) && !fs.exists(new Path(dst + ".arch")))
  }

  test("publishRetained: crash between swap and archive is adopted next publish") {
    val dst = Files.createTempDirectory("snapg").toString + "/t"
    writeRetained(dst, Seq(1L -> "g0"), retain = 3)
    writeRetained(dst, Seq(2L -> "g1"), retain = 3)
    assert(SnapshotIO.generations(spark, dst) == Seq(0L))
    // simulate the crash: displaced snapshot stranded at .arch (renamed
    // aside, archive never ran)
    val s = spark
    import s.implicits._
    Seq(9L -> "stranded").toDF("id", "v").write.parquet(dst + ".arch")
    // read() ignores .arch — the live snapshot is untouched
    assert(readIds(dst).contains(Seq(2L)))
    // next retained publish adopts the stranded generation FIRST, then
    // archives its own displaced snapshot
    writeRetained(dst, Seq(3L -> "g2"), retain = 3)
    assert(SnapshotIO.generations(spark, dst) == Seq(0L, 1L, 2L))
    assert(genVals(dst, 1L) == Seq("stranded"))
    assert(genVals(dst, 2L) == Seq("g1"))
  }

  test("vacuum: mid-crash idempotence; retain 0 keeps nothing") {
    val dst = Files.createTempDirectory("snapg").toString + "/t"
    (1 to 4).foreach(i => writeRetained(dst, Seq(i.toLong -> s"v$i"), retain = 10))
    assert(SnapshotIO.generations(spark, dst) == Seq(0L, 1L, 2L))
    // simulate a mid-vacuum crash: the oldest generation already deleted
    fs.delete(new Path(dst + ".gen-000000"), true)
    assert(SnapshotIO.generations(spark, dst) == Seq(1L, 2L))
    // re-running the same retention is idempotent and never widens loss
    SnapshotIO.vacuum(spark, dst, 2)
    assert(SnapshotIO.generations(spark, dst) == Seq(1L, 2L))
    SnapshotIO.vacuum(spark, dst, 1)
    assert(SnapshotIO.generations(spark, dst) == Seq(2L))
    SnapshotIO.vacuum(spark, dst, 0)
    assert(SnapshotIO.generations(spark, dst).isEmpty)
    // live snapshot unaffected by any vacuum
    assert(readIds(dst).contains(Seq(4L)))
  }
}
