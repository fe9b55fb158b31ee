package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering,
  * the write-time optimization that makes min/max zone-map skipping
  * work on MORE THAN ONE predicate column at once. A corpus sorted by
  * one key prunes scans on that key only; rows laid out along the
  * Z-curve give every participating dimension locality, so parquet
  * row-group/file min-max stats prune multi-dimension box predicates
  * (`x BETWEEN … AND y BETWEEN …`) that a single-column sort cannot.
  * At 100 TB this is the difference between touching ~1/k of the files
  * and touching all of them — the layout pass runs once at write time
  * and every later scan benefits (Morton 1966; the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER).
  *
  * All arithmetic is exact BIGINT — bucket = (x−min)·2^bits ÷ (range+1)
  * with integer division, then bit interleave — so the layout is
  * deterministic and the oracle replays it in closed form. No doubles,
  * no sampling.
  *
  * Scale shape: one map-side-combined min/max aggregation over the
  * dims (2·d longs to the driver), then a per-row z expression riding
  * the scan, then ONE range shuffle (`repartitionByRange`) that is the
  * write itself — the same shuffle any sorted write pays, just on a
  * better key.
  */
object Layout {

  /** Exact integer bucket of `x` into [0, 2^bits): (x−min)·2^bits ÷
    * (max−min+1). Monotone, endpoints map to 0 and 2^bits−1.
    * Caller guarantees (max−min+1)·2^bits < 2^62 (checked in
    * [[zorderBy]] from the measured range). */
  def bucket(x: Column, min: Long, max: Long, bits: Int): Column = {
    require(max >= min, s"empty range [$min, $max]")
    // integral divide (`div`), NOT Column./ which widens to double and
    // loses exactness past 2^53
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression((x.cast("long") - lit(min)) * lit(1L << bits)),
      expression(lit(max - min + 1L))))
  }

  /** Morton interleave of per-dimension buckets (each in [0, 2^bits)):
    * dimension i contributes its bit j at z-bit position j·d + i, so
    * dim 0 owns the even positions in 2-D. Closed-form sum of shifted
    * bit extractions — codegen-friendly, oracle-replayable. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits >= 1 && buckets.size * bits <= 62,
      s"need 1..62 total z bits, got ${buckets.size} dims x $bits")
    val d = buckets.size
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * d + i)
    terms.reduce(_ + _)
  }

  /** The z-value column for `dims` given their collected [min, max]
    * ranges (from [[ranges]] or known statically). */
  def zvalue(dims: Seq[Column], ranges: Seq[(Long, Long)],
             bits: Int): Column =
    interleave(dims.zip(ranges).map { case (c, (mn, mx)) =>
      bucket(c, mn, mx, bits)
    }, bits)

  /** One-pass min/max of integer-valued dims (2·d longs to the
    * driver). */
  def ranges(df: DataFrame, dims: Seq[Column]): Seq[(Long, Long)] = {
    val aggs = dims.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("long")).as(s"__mn$i"), max(c.cast("long")).as(s"__mx$i"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    dims.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
  }

  /** Z-order `df` by `dims` for writing: computes ranges, attaches the
    * `zCol` z-value, and range-partitions + sorts by it — the layout a
    * parquet write should emit (`numFiles` range partitions ≈ output
    * files, each covering a compact z interval ⇒ a compact box in
    * every dim). The z column is kept so zone-map tooling can inspect
    * it; drop it after write if unwanted. */
  def zorderBy(df: DataFrame, dims: Seq[Column], bits: Int,
               numFiles: Int, zCol: String = "zval"): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    val rs = ranges(df, dims)
    rs.foreach { case (mn, mx) =>
      require(mx - mn + 1L < (1L << (62 - bits)),
        s"range [$mn,$mx] x 2^$bits bits overflows exact bucketing; " +
          "pre-scale the dimension or lower bits")
    }
    df.withColumn(zCol, zvalue(dims, rs, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** Write `df` as a bucketed, bucket-sorted managed parquet table —
    * the layout that makes every LATER equi-join/aggregation on
    * `bucketCol` shuffle-free AND sort-free: two tables bucketed with
    * the same `nBuckets` on their join keys sort-merge join with zero
    * Exchange and zero Sort in the plan (Spark trusts the bucket
    * hash-partitioning and, when each bucket is exactly one file, the
    * within-bucket sort). At 100 TB this turns the recurring fact⋈fact
    * join from the pipeline's dominant shuffle into a per-bucket local
    * merge — the one shuffle is paid HERE, once, at write time.
    *
    * The `repartition(nBuckets, bucketCol)` before the write is what
    * guarantees one file per bucket: `repartition` and `bucketBy` use
    * the same Murmur3 `pmod` hash, so every task holds exactly the rows
    * of its own bucket id — without it each task writes a file per
    * bucket it touches (task × bucket file explosion) and multi-file
    * buckets make the reader distrust the sort order (Sort nodes come
    * back, Exchange stays gone).
    *
    * Sort elision additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — off by
    * default since 3.0 (SPARK-28595) because verifying the one-file
    * precondition costs a file listing at planning time; this writer
    * guarantees the precondition, so readers of its tables can enable
    * the flag safely. Without it the join still runs shuffle-free and
    * pays only a per-bucket local sort.
    *
    * Returns the table reader. Overwrites any existing table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val sorted = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    val s = df.sparkSession
    // clear BOTH the catalog entry and any orphaned warehouse directory:
    // with the default in-memory catalog the table metadata dies with the
    // session but its managed location survives, and a later session's
    // overwrite then fails with LOCATION_ALREADY_EXISTS
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(nBuckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
    s.table(table)
  }
}
