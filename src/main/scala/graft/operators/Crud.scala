package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CRUD semantics over immutable storage: the reference's mutable memmap
  * slots (`/root/reference/src/vector_db/storage.py:198-306`) become
  * snapshot + tombstone tables with explicit compaction. The all-zero-
  * vector≡deleted quirk (storage.py:150-158) is deliberately NOT
  * replicated (SURVEY §1.3) — deletes are explicit tombstones.
  */
object Crud {

  /** S1 upsert: update-in-place if id exists, else insert
    * (storage.py:198-230). updates win over existing; one hash shuffle
    * on id (anti-join), broadcast when updates are small. */
  def upsert(existing: DataFrame, updates: DataFrame, idCol: String): DataFrame =
    updates.unionByName(
      existing.join(updates.select(idCol), Seq(idCol), "left_anti"))

  /** Merge many versions, keep latest by version column (batch replay of
    * the reference's sequential-overwrite semantics). */
  def upsertVersioned(df: DataFrame, idCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** S5/B2: tombstone delete (lazy, like the reference's dangling-id
    * tolerance in search hydration, hnsw.py:370-373). */
  def tombstone(df: DataFrame, idCol: String, ids: Seq[Long],
                flagCol: String = "is_deleted"): DataFrame = {
    val base = if (df.columns.contains(flagCol)) df else df.withColumn(flagCol, lit(false))
    base.withColumn(flagCol, col(flagCol) || col(idCol).isin(ids: _*))
  }

  /** Compaction: drop tombstoned rows (the explicit rewrite the memmap
    * did implicitly by zeroing slots). */
  def compact(df: DataFrame, flagCol: String = "is_deleted"): DataFrame =
    df.filter(!col(flagCol)).drop(flagCol)

  /** Hard delete (filter rewrite). */
  def delete(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    df.filter(!col(idCol).isin(ids: _*))

  /** get_next_id = max(id) + 1 (storage.py:276-280); 0 on empty. */
  def nextId(df: DataFrame, idCol: String): Long =
    df.agg(coalesce(max(col(idCol)) + 1, lit(0L))).head.getLong(0)

  /** S6 id assignment for ingest. Contiguous ids need a total order —
    * fine for micro-batches; at 100 TB use assignIdsFast (sparse but
    * parallel, no single-partition window). */
  def assignIdsContiguous(df: DataFrame, orderCol: String, startId: Long,
                          idCol: String = "id"): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn(idCol, row_number().over(w).cast("long") + lit(startId - 1))
  }

  /** Parallel id assignment: unique, monotonically increasing, sparse. */
  def assignIdsFast(df: DataFrame, startId: Long, idCol: String = "id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id() + lit(startId))

  /** Contiguous parallel id assignment with a KNOWN range: ids exactly
    * `[startId, startId + n)` in partition order, plus `n` itself —
    * what a reserve-then-write ingest needs to bump its next-id
    * high-water mark BEFORE any row lands (a crash after the bump
    * leaves an id gap, never a collision; the sparse
    * [[assignIdsFast]] ids have no computable upper bound to reserve).
    * Cost: one counting pass for per-partition offsets + the consuming
    * pass — no single-partition window, no shuffle; persist `df` first
    * so the two passes see one materialization. */
  def assignIdsRange(df: DataFrame, startId: Long,
                     idCol: String = "id"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val counts = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.mapPartitionsWithIndex { (i, it) =>
      var next = startId + offsets(i)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(next +: r.toSeq)
        next += 1L
        out
      }
    }
    (spark.createDataFrame(rdd, schema), n)
  }

  /** B11-analog snapshot persistence: parquet write + read-back. */
  def snapshot(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
  def restore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Snapshot DIFF — the dataset-versioning delta report between two
    * corpus generations: every id that was added, removed, or whose
    * payload content changed (md5 compare), with both content hashes
    * for audit. Unchanged rows are dropped — the report is the delta,
    * sized by churn, not by the corpus. ONE id-equi full-outer shuffle
    * join of (id, md5) projections: payloads collapse to 32-hex hashes
    * map-side, so the shuffle carries ~50 B/row regardless of document
    * size — the 100 TB shape for release-to-release corpus audits. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"),
      md5(col(payloadCol).cast("string")).as("old_md5"))
    val n = newDf.select(col(idCol).as("__id"),
      md5(col(payloadCol).cast("string")).as("new_md5"))
    o.join(n, Seq("__id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("__id").as(idCol), col("status"),
        col("old_md5"), col("new_md5"))
  }
}
