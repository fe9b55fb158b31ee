package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data export: deterministic shard assignment, sharded
  * parquet writing, and per-shard manifests — the loader-facing tail of
  * a curation pipeline (the reference's persistence boundary,
  * `/root/reference/src/vector_db/storage/persistence.py`, writes one
  * pickle; a 100 TB export writes N shards plus a manifest the trainer
  * uses for scheduling, integrity checks, and resumption).
  *
  * Scale shape: assignment is a pure per-row hash (rides the scan); the
  * manifest is one ≤ nShards-group aggregation (map-side combined); the
  * write is `partitionBy(shard)` so each task streams its shard files
  * without a pre-sort. The content checksum is an order-independent
  * exact BIGINT sum of per-row hashes, so two exports of the same data
  * produce the same manifest regardless of partitioning or task order —
  * and the manifest is DuckDB-replayable for the same reason.
  */
object Export {

  /** Deterministic shard of an id: [[Sketch.hash32]]("salt|id") mod
    * nShards — stable across runs, engines, and partitionings (the
    * [[Sampling]] salt discipline, not Spark's JVM-hash `pmod`). */
  def shardOf(idCol: Column, nShards: Int, salt: String = ""): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    (Sketch.hash32(concat_ws("|", lit(salt), idCol.cast("string"))) % nShards)
      .cast("int")
  }

  /** Per-shard manifest of a corpus under [[shardOf]] assignment:
    * row count, payload byte/char total, id range, and an
    * order-independent content checksum (exact BIGINT sum of
    * hash32(id ∥ md5(payload)) — any row change, addition, or loss
    * moves it). One bounded aggregation; nothing reaches the driver. */
  def manifest(df: DataFrame, idCol: String, payloadCol: String,
               bytesCol: Column, nShards: Int, salt: String = ""): DataFrame =
    df.select(shardOf(col(idCol), nShards, salt).as("shard"),
        col(idCol).as("__id"), bytesCol.cast("long").as("__bytes"),
        Sketch.hash32(concat_ws("|", col(idCol).cast("string"),
          md5(col(payloadCol).cast("string")))).as("__rh"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__bytes")).as("total_bytes"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"),
        sum(col("__rh")).as("content_sum"))

  /** Write the corpus as `nShards` hash shards
    * (`outDir/shard=<k>/part-*.parquet`) and return the manifest of
    * what was written. The shard column drives `partitionBy`, so every
    * output file is single-shard and a trainer can schedule shards
    * independently; `filesPerShard` repartitions (shard, salted split)
    * when individual shard files should stay bounded. */
  def writeShards(df: DataFrame, idCol: String, payloadCol: String,
                  bytesCol: Column, nShards: Int, outDir: String,
                  salt: String = "", filesPerShard: Int = 1): DataFrame = {
    require(filesPerShard >= 1, s"filesPerShard must be >= 1, got $filesPerShard")
    val sharded = df.withColumn("shard", shardOf(col(idCol), nShards, salt))
    val placed =
      if (filesPerShard == 1) sharded.repartition(nShards, col("shard"))
      else sharded.repartition(nShards * filesPerShard, col("shard"),
        Sketch.hash32(concat_ws("|", lit(salt + "#file"),
          col(idCol).cast("string"))) % filesPerShard)
    placed.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifest(df, idCol, payloadCol, bytesCol, nShards, salt)
  }

  /** Integrity check of an exported directory against a manifest:
    * recompute [[manifest]] over the re-read shards and anti-join —
    * returns the shards whose (n_rows, total_bytes, content_sum)
    * drifted (empty ⇔ export intact). */
  def verifyExport(spark: org.apache.spark.sql.SparkSession, outDir: String,
                   expected: DataFrame, idCol: String, payloadCol: String,
                   bytesCol: Column, nShards: Int, salt: String = ""): DataFrame = {
    val actual = manifest(
      spark.read.parquet(outDir).drop("shard"), idCol, payloadCol,
      bytesCol, nShards, salt)
    actual.join(expected,
      Seq("shard", "n_rows", "total_bytes", "min_id", "max_id", "content_sum"),
      "left_anti")
      .unionByName(expected.join(actual,
        Seq("shard", "n_rows", "total_bytes", "min_id", "max_id", "content_sum"),
        "left_anti"))
  }
}
