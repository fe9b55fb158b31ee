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

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def complete(f: FileSystem, dir: Path): Boolean =
    f.exists(dir) && f.exists(new Path(dir, "_SUCCESS"))

  /** Atomically publish `df` as the snapshot at `dst`. */
  def publish(df: DataFrame, dst: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark)
    val dstP = new Path(dst)
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
    if (!f.rename(tmpP, dstP))
      throw new java.io.IOException(s"rename $tmpP -> $dstP failed")
    f.delete(bakP, true)
  }

  /** Read the current snapshot, running crash recovery first.
    * None only when no snapshot was ever published. */
  def read(spark: SparkSession, dst: String): Option[DataFrame] = {
    val f = fs(spark)
    val dstP = new Path(dst)
    val tmpP = new Path(dst + ".tmp")
    val bakP = new Path(dst + ".bak")
    if (!f.exists(dstP)) {
      if (complete(f, tmpP)) {
        if (!f.rename(tmpP, dstP))
          throw new java.io.IOException(s"recovery rename $tmpP -> $dstP failed")
        f.delete(bakP, true)
      } else if (f.exists(bakP)) {
        if (!f.rename(bakP, dstP))
          throw new java.io.IOException(s"recovery rename $bakP -> $dstP failed")
      }
    }
    if (f.exists(dstP)) Some(spark.read.parquet(dst)) else None
  }
}
