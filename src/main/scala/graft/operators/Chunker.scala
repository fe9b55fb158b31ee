package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the two layout transforms
  * between a curated corpus and trainable fixed-length samples.
  *
  *  - [[chunk]]: split each document into fixed-size word windows with
  *    overlap (context-window sharding for long docs). Pure per-row
  *    explode — embarrassingly parallel, no shuffle.
  *  - [[packOffsets]]: GPT-style concat-and-slice packing — documents
  *    are concatenated in id order and cut into `capacity`-token
  *    training windows; each document's placement is
  *    `(pack_id, pack_offset) = (cum / capacity, cum % capacity)` where
  *    `cum` is the total token count before it. Implemented as a
  *    distributed prefix sum (range repartition → per-partition totals
  *    → broadcast prefix), NOT a global single-reducer window: the only
  *    driver-side data is one long per partition, so the assignment
  *    scales linearly to arbitrarily many documents.
  */
object Chunker {

  /** Fixed-size word windows with `overlap` shared tokens between
    * consecutive chunks. Output: idCol, chunk_id, chunk_text,
    * n_chunk_tokens. Every document yields ≥ 1 chunk. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = split(col(textCol), "\\s+")
    // ceil((n - overlap) / stride) starts, min 1 — the last window is
    // allowed to be short rather than dropping tail tokens
    val nChunks = greatest(lit(1L),
      ceil((size(toks) - lit(overlap)).cast("double") / lit(stride.toDouble)).cast("long"))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"),
        col("__toks"))
      .withColumn("__chunk",
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"))
  }

  /** Concat-and-slice packing offsets (see object doc). Output: idCol
    * (long), n_tok, pack_id, pack_offset — deterministic in `idCol`
    * order regardless of partitioning. `tokCol` must be non-negative.
    *
    * RDD `mapPartitionsWithIndex` is the genuine per-partition
    * imperative case here: a running sum with a per-partition seed is
    * exactly what the Dataset API cannot express without a global
    * window (single reducer — the scale killer this avoids). */
  def packOffsets(df: DataFrame, idCol: String, tokCol: String, capacity: Long,
                  numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long").as("__id"), col(tokCol).cast("long").as("n_tok"))
      .repartitionByRange(parts, col("__id"))
      .sortWithinPartitions("__id")
    // one physical plan instance → both passes see identical partitions
    val base = sorted.rdd
    // pass 1: per-partition token totals — bounded driver traffic (one
    // long per partition, independent of row count)
    val totals = base.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(s += _.getLong(1))
      Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val prefix = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(prefix)
    // pass 2: local running sum seeded with the partition's prefix
    val packed = base.mapPartitionsWithIndex { case (pid, it) =>
      var cum = bc.value(pid)
      it.map { r =>
        val nt = r.getLong(1)
        val out = (r.getLong(0), nt, cum / capacity, cum % capacity)
        cum += nt
        out
      }
    }
    import spark.implicits._
    packed.toDF(idCol, "n_tok", "pack_id", "pack_offset")
  }
}
