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
    * tail is small, which the cadence guarantees). */
  def readMerged(spark: SparkSession, dir: String,
                 idCol: String): Option[DataFrame] = {
    val base = SnapshotIO.read(spark, basePath(dir))
    val w = watermark(spark, dir)
    val live = deltaSeqs(spark, dir).filter(_ > w)
    if (live.isEmpty) return base
    val deltas = live.map(s0 =>
        spark.read.parquet(seqDir(dir, s0)).withColumn(SeqCol, lit(s0)))
      .reduce(_ unionByName _)
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
          b.join(resolved.select(col(idCol)), Seq(idCol), "left_anti"))
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
    * two processes are not coordinated. */
  def compact(spark: SparkSession, dir: String, idCol: String,
              retainGenerations: Int = 0): Long = {
    val w = watermark(spark, dir)
    val live = deltaSeqs(spark, dir).filter(_ > w)
    if (live.isEmpty) return w
    val hi = live.max
    readMerged(spark, dir, idCol).foreach { m =>
      if (retainGenerations > 0)
        SnapshotIO.publishRetained(m, basePath(dir), retainGenerations)
      else SnapshotIO.publish(m, basePath(dir))
    }
    setWatermark(spark, dir, hi)
    // only delete BELOW the just-durable watermark — includes stale
    // dirs ≤ the previous watermark left by an earlier crashed cleanup
    val f = fs(spark, new Path(dir))
    deltaSeqs(spark, dir).filter(_ <= hi)
      .foreach(s0 => f.delete(new Path(seqDir(dir, s0)), true))
    hi
  }
}
