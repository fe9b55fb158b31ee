package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Append-only delta log with merge-on-read — the O(batch) streaming
  * upsert layout. The reference's threshold flush persists the whole
  * store per save (`services/indexing_service.py:77-89`,
  * `storage.py:241-306` pickles the full slot file); the round-12
  * engine shape still rewrote the whole parquet snapshot per
  * micro-batch, an O(corpus) read+write that a 1 GB flush into a
  * 100 TB store cannot pay. This log makes per-flush I/O proportional
  * to the BATCH:
  *
  *  - `dir/base`   — the compacted snapshot, published through
  *                   [[SnapshotIO]]'s crash-safe rename protocol.
  *  - `dir/delta/d<seq>` — one parquet dir per flush (seq = the
  *                   checkpointed streaming batchId), rows carrying a
  *                   `__tomb` boolean (true = delete this id).
  *  - `dir/_watermark` — highest seq already folded into base; deltas
  *                   at or below it are logically dead.
  *
  * Read = base ∪ (live deltas, latest-seq-wins per id), tombstones
  * dropped, base rows shadowed by any delta id via an anti-join whose
  * build side is the (small) delta id set — the base is scanned once
  * and never shuffled. Compaction folds live deltas into base on a
  * cadence, advancing the watermark, so the delta tail stays bounded
  * by the compaction window while per-flush cost stays O(batch).
  *
  * Crash/replay safety (the checkpoint replays a batch after any
  * crash; every arrow below is idempotent under replay):
  *  - append crashes mid-write → partial dir without `_SUCCESS` is
  *    invisible to readers; the replayed batch rewrites it (overwrite).
  *  - replay AFTER its delta was folded and deleted → the rewritten
  *    delta's seq ≤ watermark → ignored by reads, removed by the next
  *    compaction.
  *  - compaction crashes after publishing base but before the
  *    watermark write → the folded deltas still read as live and are
  *    re-applied OVER the new base; latest-seq-wins resolution picks
  *    the same row the fold picked (all folded seqs are still
  *    present), so the merged view is unchanged. The watermark is only
  *    advanced before any delta deletion, never after.
  *  - watermark write is tmp + atomic rename; a torn write reads as
  *    absent (−1), which degrades to the re-apply case above.
  */
object DeltaLog {

  /** Tombstone marker column in delta rows (absent from base). */
  val TombCol = "__tomb"
  private val SeqCol = "__delta_seq"
  private val DirPattern = """^d(\d+)$""".r

  private def basePath(dir: String) = s"$dir/base"
  private def deltaRoot(dir: String) = s"$dir/delta"
  private def seqDir(dir: String, seq: Long) = f"${deltaRoot(dir)}/d$seq%012d"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // -----------------------------------------------------------------
  // Legacy-layout adoption: a store written by the pre-delta-log code
  // is a plain SnapshotIO snapshot AT `dir` ITSELF (parquet files +
  // _SUCCESS at the root). Reading such a dir through the delta-log
  // paths alone would silently return empty (no base/ subdir) and
  // orphan every pre-existing row, so [[readMerged]] detects the
  // legacy root and ADOPTS it as the initial base — pure file RENAMES
  // (O(files), no data rewrite; a 100 TB legacy store migrates in
  // metadata time). Crash-safe via a `_adopting` resume marker:
  //  - marker created, files partially moved → next read resumes the
  //    move (each file is either at the root or in base__adopt —
  //    idempotent).
  //  - tmp renamed to base, marker not yet deleted → resume sees base
  //    present, drops leftovers and the marker.
  // Single-writer, like every other mutation in this log.
  // -----------------------------------------------------------------

  private def adoptIfLegacy(spark: SparkSession, dir: String): Unit = {
    val rootP = new Path(dir)
    val f = fs(spark, rootP)
    // a legacy root mid-SnapshotIO-publish crash (dir renamed aside):
    // promote tmp/bak exactly as SnapshotIO.read would — only when dir
    // itself is missing, matching that recovery contract
    if (!f.exists(rootP) &&
        (f.exists(new Path(dir + ".tmp", "_SUCCESS")) ||
          f.exists(new Path(dir + ".bak")))) {
      SnapshotIO.read(spark, dir); ()
    }
    if (!f.exists(rootP)) return
    val marker = new Path(rootP, "_adopting")
    val legacy = f.exists(new Path(rootP, "_SUCCESS"))
    if (!legacy && !f.exists(marker)) return
    // resume marker FIRST: every later crash point replays through here
    if (!f.exists(marker)) f.create(marker, true).close()
    val baseP = new Path(basePath(dir))
    val tmp = new Path(rootP, "base__adopt")
    if (f.exists(baseP)) {
      // a resumed adoption that already renamed tmp → base: the file
      // moves all preceded that rename, so the root is clean — drop
      // leftovers and the marker
      f.delete(tmp, true)
    } else {
      // two concurrent READERS of the same legacy store can both enter
      // adoption (reads are mutating here, by design): whichever renames
      // tmp → base first wins, and the loser's next file/dir operation
      // fails with base present and tmp gone. That is a WIN, not an
      // error — every file already landed in base via the winner — so
      // each failure point below stands down when base exists, the same
      // race tolerance SnapshotIO.read applies to its publish renames.
      def concurrentWin(): Boolean = f.exists(baseP)
      if (!f.mkdirs(tmp) && !f.exists(tmp)) {
        if (concurrentWin()) { f.delete(marker, false); return }
        throw new java.io.IOException(s"mkdir $tmp failed")
      }
      // move every root-level FILE (parquet parts, _SUCCESS, committer
      // sidecars); delta-layout files and subdirs (delta/, markers)
      // stay put
      val keep = Set("_adopting", "_watermark", "_watermark.tmp",
        "_basecount", "_basecount.tmp")
      f.listStatus(rootP).toSeq
        .filter(st => st.isFile && !keep(st.getPath.getName))
        .foreach { st =>
          val to = new Path(tmp, st.getPath.getName)
          if (!f.rename(st.getPath, to) && !f.exists(to)) {
            if (concurrentWin()) { f.delete(marker, false); return }
            throw new java.io.IOException(s"rename ${st.getPath} -> $to failed")
          }
        }
      if (!f.rename(tmp, baseP) && !f.exists(baseP))
        throw new java.io.IOException(s"rename $tmp -> $baseP failed")
    }
    f.delete(marker, false)
    ()
  }

  /** Append one flush as delta `seq`. Overwrite-mode so a checkpoint
    * replay of the same batchId rewrites rather than duplicates. Rows
    * where `tombstoneCol` is true are recorded as deletions of their
    * id; the column itself is normalized into [[TombCol]]. The batch
    * must already be id-unique (the stream dedups before appending). */
  def append(batch: DataFrame, dir: String, seq: Long,
             tombstoneCol: Option[String] = None): Unit = {
    require(seq >= 0, s"delta seq must be >= 0, got $seq")
    val normalized = tombstoneCol match {
      case Some(c) =>
        require(batch.columns.contains(c), s"tombstone column '$c' missing")
        val marked = batch.withColumn(TombCol,
          coalesce(col(c).cast("boolean"), lit(false)))
        // a caller naming TombCol itself already normalized in place —
        // dropping would discard the marker it just wrote
        if (c == TombCol) marked else marked.drop(c)
      case None =>
        require(!batch.columns.contains(TombCol),
          s"reserved column '$TombCol' present — pass it as tombstoneCol")
        batch.withColumn(TombCol, lit(false))
    }
    normalized.write.mode("overwrite").parquet(seqDir(dir, seq))
  }

  /** Highest seq folded into base (−1 before the first compaction). */
  def watermark(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir, "_watermark")
    val f = fs(spark, p)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        // a torn/garbled marker must degrade to "reapply deltas"
        // (idempotent), never to a crash on every subsequent read
        s.toLongOption.getOrElse(-1L)
      } finally in.close()
    }
  }

  private def setWatermark(spark: SparkSession, dir: String, w: Long): Unit = {
    val p = new Path(dir, "_watermark")
    val tmp = new Path(dir, "_watermark.tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(w.toString.getBytes("UTF-8")) finally out.close()
    f.delete(p, false)
    if (!f.rename(tmp, p) && !f.exists(p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  /** The delta dir for one seq — for reading back a just-appended
    * batch (e.g. to derive index-side rows from exactly what landed). */
  def deltaPath(dir: String, seq: Long): String = seqDir(dir, seq)

  /** Next unused delta seq for BATCH (non-streaming) appends: one past
    * the max of the watermark and every complete delta on disk. A torn
    * previous append (no `_SUCCESS`) is invisible here, so its seq is
    * reused and overwritten — the same idempotence a streaming replay
    * relies on. Single-writer, like every mutation in this log. */
  def nextSeq(spark: SparkSession, dir: String): Long =
    math.max(watermark(spark, dir),
      deltaSeqs(spark, dir).lastOption.getOrElse(-1L)) + 1

  /** Every complete (`_SUCCESS`-marked) delta seq on disk, sorted. A
    * dir without the marker is an in-flight or torn write — invisible
    * until its replay completes it. */
  def deltaSeqs(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new Path(deltaRoot(dir))
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case DirPattern(d) if f.exists(new Path(st.getPath, "_SUCCESS")) =>
          Some(d.toLong)
        case _ => None
      }
    }.sorted
  }

  /** Merged current state: base shadowed by live deltas, latest seq
    * wins per id, tombstoned ids dropped. None only when nothing was
    * ever written. The base side is scanned once with NO shuffle — the
    * only exchange is over the delta tail (bounded by the compaction
    * cadence) plus the anti-join against its id set (broadcast when the
    * tail is small, which the cadence guarantees).
    *
    * A pre-delta-log plain snapshot at the dir ROOT is adopted as the
    * initial base first ([[adoptIfLegacy]] — file renames only), so
    * opening a legacy store through the log never reads it as empty.
    * Unions tolerate schema drift between base and deltas (columns
    * added by newer writers pad null on the older side). */
  def readMerged(spark: SparkSession, dir: String,
                 idCol: String): Option[DataFrame] = {
    adoptIfLegacy(spark, dir)
    val base = SnapshotIO.read(spark, basePath(dir))
    val w = watermark(spark, dir)
    val live = deltaSeqs(spark, dir).filter(_ > w)
    if (live.isEmpty) return base
    val deltas = live.map(s0 =>
        spark.read.parquet(seqDir(dir, s0)).withColumn(SeqCol, lit(s0)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // latest-seq-wins per id; within one seq the append is id-unique
    val win = Window.partitionBy(col(idCol)).orderBy(col(SeqCol).desc)
    val resolved = deltas.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") === 1).drop("__rn", SeqCol)
    val alive = resolved.filter(!col(TombCol)).drop(TombCol)
    Some(base match {
      case None => alive
      case Some(b) =>
        // tombstoned ids participate in the shadow set: their base rows
        // must disappear even though they contribute no delta row
        alive.unionByName(
          b.join(resolved.select(col(idCol)), Seq(idCol), "left_anti"),
          allowMissingColumns = true)
    })
  }

  /** Fold the live delta tail into base (crash-safe publish), advance
    * the watermark, then drop the folded dirs. Returns the new
    * watermark (unchanged when the tail was empty). O(corpus) by
    * design — run on a cadence so its cost amortizes to
    * O(corpus / compactEvery) per flush, not on every flush.
    *
    * `retainGenerations > 0` archives the DISPLACED base as a
    * numbered generation ([[SnapshotIO.publishRetained]]), so each
    * compaction becomes a time-travel point: `SnapshotIO
    * .readGeneration(spark, s"$dir/base", g)` reads any kept fold for
    * rollback / [[graft.operators.Crud.snapshotDiff]] audits. The log
    * assumes ONE writer (the owning streaming query or an external
    * maintenance job between flushes) — concurrent compactions from
    * two processes are not coordinated.
    *
    * `transform` rewrites the folded view before it is published (the
    * facade drops its tombstone-flagged rows here). It must keep
    * `idCol` and be stable under re-merge: a crash between the base
    * publish and the watermark write re-applies the folded deltas over
    * the transformed base, so rows the transform dropped can reappear
    * (with their pre-transform payload) until the next compaction —
    * acceptable for row filters like tombstone removal, wrong for
    * anything a re-applied delta row would contradict. */
  def compact(spark: SparkSession, dir: String, idCol: String,
              retainGenerations: Int = 0,
              transform: DataFrame => DataFrame = identity,
              foldEmptyTail: Boolean = false): Long = {
    val w = watermark(spark, dir)
    val all = deltaSeqs(spark, dir)
    val live = all.filter(_ > w)
    val f = fs(spark, new Path(dir))
    if (live.isEmpty) {
      // a checkpoint replay can rewrite a delta at seq ≤ watermark
      // (crash during the compaction's own batch); reads ignore it, but
      // leave no stale dirs behind even when there is nothing to fold
      all.filter(_ <= w).foreach(s0 => f.delete(new Path(seqDir(dir, s0)), true))
      // `foldEmptyTail` still pushes the transform through the base —
      // the facade's physical tombstone drop must apply even when every
      // delete already folded (e.g. right after a legacy adoption)
      if (foldEmptyTail) {
        adoptIfLegacy(spark, dir)
        SnapshotIO.read(spark, basePath(dir)).foreach { b =>
          if (retainGenerations > 0)
            SnapshotIO.publishRetained(transform(b), basePath(dir), retainGenerations)
          else SnapshotIO.publish(transform(b), basePath(dir))
          setBaseCount(spark, dir, w, spark.read.parquet(basePath(dir)).count())
        }
      }
      return w
    }
    val hi = live.max
    readMerged(spark, dir, idCol).foreach { m =>
      if (retainGenerations > 0)
        SnapshotIO.publishRetained(transform(m), basePath(dir), retainGenerations)
      else SnapshotIO.publish(transform(m), basePath(dir))
    }
    setWatermark(spark, dir, hi)
    // record the folded base's row count, PAIRED with the watermark it
    // belongs to (stale pairs from a crash between the two writes are
    // detected by the seq mismatch) — an O(delta) store-size tracker
    // reads this instead of counting the corpus. Zero-column scan:
    // parquet serves it from row-group metadata.
    setBaseCount(spark, dir, hi, spark.read.parquet(basePath(dir)).count())
    // only delete BELOW the just-durable watermark — includes stale
    // dirs ≤ the previous watermark left by an earlier crashed cleanup
    deltaSeqs(spark, dir).filter(_ <= hi)
      .foreach(s0 => f.delete(new Path(seqDir(dir, s0)), true))
    hi
  }

  /** Row count of the compacted base, valid only when recorded by the
    * compaction that produced the CURRENT watermark (None before the
    * first compaction, after a legacy adoption, or when a crash split
    * the watermark/count writes — callers fall back to counting). */
  def baseCount(spark: SparkSession, dir: String): Option[Long] = {
    val p = new Path(dir, "_basecount")
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      s.split(':') match {
        case Array(wm, n) =>
          (wm.toLongOption, n.toLongOption) match {
            case (Some(w), Some(c)) if w == watermark(spark, dir) => Some(c)
            case _ => None // stale or torn — recount
          }
        case _ => None
      }
    }
  }

  /** Upper bound on the merged live row count, from O(delta) state:
    * the base count recorded at the last fold (falling back to one
    * zero-column base scan when the pair is missing or stale) plus
    * each live delta's non-tombstone row count (footer-cheap scans of
    * the tail only). An upper bound because duplicate-id inserts are
    * double-counted and tombstone hits are not subtracted — exact
    * resolution of the overlap is the merged count, which a
    * threshold-tracking caller only needs once this bound says a
    * crossing is possible. */
  def sizeUpperBound(spark: SparkSession, dir: String): Long = {
    val bc = baseCount(spark, dir).getOrElse(
      SnapshotIO.read(spark, basePath(dir)).map(_.count()).getOrElse(0L))
    val w = watermark(spark, dir)
    bc + deltaSeqs(spark, dir).filter(_ > w).map(s0 =>
      spark.read.parquet(seqDir(dir, s0)).filter(!col(TombCol)).count()).sum
  }

  private def setBaseCount(spark: SparkSession, dir: String, wm: Long,
                           n: Long): Unit = {
    val p = new Path(dir, "_basecount")
    val tmp = new Path(dir, "_basecount.tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(s"$wm:$n".getBytes("UTF-8")) finally out.close()
    f.delete(p, false)
    if (!f.rename(tmp, p) && !f.exists(p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }
}
