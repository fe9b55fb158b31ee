package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe parquet snapshot publish/read.
  *
  * Publish is write-tmp → rename-current-aside → rename-tmp-in →
  * drop-backup. There is no delete-then-rename window: at every crash
  * point either the destination dir, a complete `.tmp` (with Spark's
  * `_SUCCESS` marker), or the `.bak` of the previous snapshot exists,
  * and [[read]] recovers deterministically:
  *
  *  - dst exists → read it (leftover tmp/bak are stale, cleaned next publish)
  *  - dst missing, tmp complete → promote tmp (the newer state; the
  *    stream checkpoint replays the batch and the upsert is idempotent)
  *  - dst missing, bak exists → restore bak (publish died before tmp
  *    finished)
  *  - nothing → first publish hasn't happened (None)
  *
  * Only genuine absence maps to None; any other read failure propagates
  * instead of being misread as "first batch" (which would silently
  * replace the store with a single batch's rows).
  */
object SnapshotIO {

  // resolve the filesystem from the snapshot path itself, not the
  // default FS — an s3a:// store on an hdfs:// default cluster must use
  // the path's own filesystem for every exists/rename/delete
  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def complete(f: FileSystem, dir: Path): Boolean =
    f.exists(dir) && f.exists(new Path(dir, "_SUCCESS"))

  /** Atomically publish `df` as the snapshot at `dst`. */
  def publish(df: DataFrame, dst: String): Unit = {
    val spark = df.sparkSession
    val dstP = new Path(dst)
    val f = fs(spark, dstP)
    val tmpP = new Path(dst + ".tmp")
    val bakP = new Path(dst + ".bak")
    // The write may lazily read the current dst (upsert/compact plans do);
    // dst is not touched until the tmp write has fully committed.
    df.write.mode("overwrite").parquet(tmpP.toString)
    if (f.exists(bakP)) f.delete(bakP, true)
    if (f.exists(dstP)) {
      if (!f.rename(dstP, bakP))
        throw new java.io.IOException(s"rename $dstP -> $bakP failed")
    }
    // mirror read(): a concurrent reader's crash recovery may win the
    // tmp→dst rename between our rename-aside and rename-in — dst exists
    // afterwards either way, so only a rename that leaves dst missing is
    // a real failure (reporting the race as an IOException would turn a
    // successful publish into a spurious error)
    if (!f.rename(tmpP, dstP) && !f.exists(dstP))
      throw new java.io.IOException(s"rename $tmpP -> $dstP failed")
    f.delete(bakP, true)
  }

  /** Coalesce the published snapshot's files toward `targetBytes` each —
    * the OPTIMIZE/compaction pass every incremental-upsert store needs:
    * micro-batch upserts each republish the snapshot, and at cluster
    * scale a high-frequency stream leaves thousands of small parquet
    * files whose per-file open/footer cost comes to dominate every
    * scan. One `coalesce` (a read-and-rewrite with NO shuffle — file
    * merging needs no row movement across keys) into
    * ⌈currentBytes / targetBytes⌉ files, republished through the same
    * crash-safe rename protocol as every other write (the plan lazily
    * reads dst while writing dst.tmp — dst is untouched until the tmp
    * commit, exactly the upsert path's contract).
    *
    * MERGE-ONLY by contract: coalesce cannot split, so when the
    * snapshot already has at-or-fewer files than the byte target asks
    * for, this is a no-op (returns the current count, no rewrite) —
    * splitting an oversized file back up is a shuffle
    * (`repartition`/[[graft.operators.Layout.zorderBy]]) and a layout
    * decision, not compaction. Returns the resulting file count
    * (0 = no snapshot published yet). Content is bit-identical by
    * construction. */
  def compactFiles(spark: SparkSession, dst: String,
                   targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    read(spark, dst) match {
      case None => 0L
      case Some(cur) =>
        val p = new Path(dst)
        val f = fs(spark, p)
        val bytes = f.getContentSummary(p).getLength
        val curFiles = f.listStatus(p)
          .count(_.getPath.getName.endsWith(".parquet")).toLong
        val files = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
          .min(Int.MaxValue.toLong)
        if (files >= curFiles) curFiles
        else {
          publish(cur.coalesce(files.toInt), dst)
          // coalesce caps at the scan's partition count — file
          // bin-packing (maxPartitionBytes/openCostInBytes) can pack
          // the small files into FEWER partitions than the byte
          // target asks for, so report what was actually written
          f.listStatus(p).count(_.getPath.getName.endsWith(".parquet")).toLong
        }
    }
  }

  // ---------------------------------------------------------------
  // Generation retention: publish variants that ARCHIVE the previous
  // snapshot as `dst.gen-%06d` instead of dropping it, so time-travel
  // consumers (corpus_diff against any kept generation, rollback,
  // audits) can read history without a second store.
  // ---------------------------------------------------------------

  private val GenPattern = """\.gen-(\d{6})$""".r.unanchored

  private def genPath(dst: String, g: Long): Path =
    new Path(f"$dst.gen-$g%06d")

  /** Sorted ascending generation numbers currently kept at `dst`. */
  def generations(spark: SparkSession, dst: String): Seq[Long] = {
    val dstP = new Path(dst)
    val f = fs(spark, dstP)
    val parent = dstP.getParent
    if (parent == null || !f.exists(parent)) return Seq.empty
    f.listStatus(parent).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith(dstP.getName + ".gen-") =>
        GenPattern.findFirstMatchIn(n).map(_.group(1).toLong)
    }.flatten.sorted
  }

  /** Read one archived generation (None when not kept / vacuumed). */
  def readGeneration(spark: SparkSession, dst: String,
                     gen: Long): Option[DataFrame] = {
    val p = genPath(dst, gen)
    val f = fs(spark, p)
    if (complete(f, p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Delete all but the newest `retain` generations. Oldest-first, so a
    * mid-vacuum crash leaves a contiguous NEWEST suffix — re-running is
    * idempotent and never widens the loss. */
  def vacuum(spark: SparkSession, dst: String, retain: Int): Unit = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val gens = generations(spark, dst)
    val f = fs(spark, new Path(dst))
    gens.dropRight(retain).foreach(g => f.delete(genPath(dst, g), true))
  }

  /** [[publish]] that archives the displaced snapshot as the next
    * generation and retains the newest `retain` generations (0 keeps
    * none — ≡ plain publish semantics with extra renames). Crash safety
    * extends the plain protocol across generations via a DEDICATED
    * `.arch` rename name — deliberately NOT `.bak`, which [[read]]'s
    * recovery deletes after promoting a complete tmp (that path would
    * silently lose the displaced generation). Crash points:
    *
    *  - after the tmp write: dst still live; next publish rewrites tmp.
    *  - between dst→arch and tmp→dst: dst missing + tmp complete —
    *    [[read]] promotes tmp exactly as for plain publish; the arch
    *    survives (read ignores it) and the NEXT retained publish
    *    archives it first, so the generation arrives one publish late,
    *    never lost.
    *  - between tmp→dst and the arch→gen archive: dst live + arch
    *    present — same recovery, next retained publish archives first.
    *  - mid-vacuum: oldest-first deletion, idempotent re-run.
    *
    * Archive numbering is monotonic (max kept + 1); vacuum runs last.
    * Mixing plain [[publish]] into a retained store works (it just
    * contributes no generation); a leftover `.arch` is then adopted by
    * the next retained publish. */
  def publishRetained(df: DataFrame, dst: String, retain: Int): Unit = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val spark = df.sparkSession
    val dstP = new Path(dst)
    val f = fs(spark, dstP)
    val archP = new Path(dst + ".arch")
    def archive(): Unit = if (f.exists(archP)) {
      val next = generations(spark, dst).lastOption.getOrElse(-1L) + 1L
      if (!f.rename(archP, genPath(dst, next)))
        throw new java.io.IOException(
          s"rename $archP -> ${genPath(dst, next)} failed")
    }
    archive() // adopt a crashed publish's leftover before making a new one
    val tmpP = new Path(dst + ".tmp")
    df.write.mode("overwrite").parquet(tmpP.toString)
    if (f.exists(dstP)) {
      if (!f.rename(dstP, archP))
        throw new java.io.IOException(s"rename $dstP -> $archP failed")
    }
    if (!f.rename(tmpP, dstP) && !f.exists(dstP))
      throw new java.io.IOException(s"rename $tmpP -> $dstP failed")
    archive()
    vacuum(spark, dst, retain)
  }

  /** Read the current snapshot, running crash recovery first.
    * None only when no snapshot was ever published. A recovery rename
    * that loses a race to a concurrent reader is fine — dst exists
    * afterwards either way, so only a rename that leaves dst missing is
    * an error. */
  def read(spark: SparkSession, dst: String): Option[DataFrame] = {
    val dstP = new Path(dst)
    val f = fs(spark, dstP)
    val tmpP = new Path(dst + ".tmp")
    val bakP = new Path(dst + ".bak")
    if (!f.exists(dstP)) {
      if (complete(f, tmpP)) {
        if (!f.rename(tmpP, dstP) && !f.exists(dstP))
          throw new java.io.IOException(s"recovery rename $tmpP -> $dstP failed")
        f.delete(bakP, true)
      } else if (f.exists(bakP)) {
        if (!f.rename(bakP, dstP) && !f.exists(dstP))
          throw new java.io.IOException(s"recovery rename $bakP -> $dstP failed")
      }
    }
    if (f.exists(dstP)) Some(spark.read.parquet(dst)) else None
  }
}
