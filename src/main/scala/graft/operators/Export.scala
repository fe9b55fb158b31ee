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

  /** WebDataset-style tar shard LAYOUT: for every document, the shard
    * it lands in ([[shardOf]]), its member name, payload byte size, and
    * the byte offset of its 512-byte ustar header inside the shard tar
    * — the loader-facing index a WebDataset/tarfile trainer seeks by.
    * Entries are laid out in ascending-id order per shard; each costs
    * one header block plus ⌈bytes/512⌉ payload blocks. Pure column
    * arithmetic (the ⌈/512⌉ is an exact `shiftright` — no double
    * division) over ONE per-shard window cumsum; fully oracle-checkable,
    * which pins the exact byte layout [[writeTarShards]] then emits.
    *
    * Scale: one shuffle (the per-shard window); at N shards the window
    * partitions are corpus/N and a trainer-friendly shard is ≤ a few
    * GB by construction — callers size nShards accordingly. */
  def tarShardPlan(df: DataFrame, idCol: String, payloadCol: String,
                   nShards: Int, salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(shardOf(col(idCol), nShards, salt).as("shard"),
        col(idCol).as("__id"),
        // NULL payload = empty member (writeTarShardsMulti's contract:
        // a sample never silently loses a field), so it still costs one
        // header block — octet_length(NULL) would drop it from the
        // cumsum and shift every later offset short by 512 bytes.
        octet_length(coalesce(col(payloadCol), lit(""))).cast("long")
          .as("n_bytes"))
      .withColumn("__blocks",
        lit(1L) + shiftright(col("n_bytes") + lit(511L), 9))
      .select(col("shard"), col("__id").as(idCol),
        concat(col("__id").cast("string"), lit(".txt")).as("name"),
        col("n_bytes"),
        (coalesce(sum(col("__blocks")).over(w), lit(0L)) * 512L).as("offset"))
  }

  /** Write the corpus as `nShards` POSIX-ustar tar files
    * (`outDir/shard-NNNNN.tar`, one text member per document, names and
    * offsets exactly as [[tarShardPlan]] lays out) and return the
    * per-shard write manifest (shard, n_entries, tar_bytes, tar_md5).
    * The WebDataset export shape: training loaders stream tar members
    * sequentially, so the written bytes ARE the loader's input format —
    * no parquet reader in the hot path.
    *
    * Determinism: entries are sorted by id within a shard, headers
    * carry mtime/uid/gid = 0 and a fixed 0644 mode, so the tar bytes —
    * and therefore `tar_md5` — are a pure function of the shard's
    * (id, payload) multiset, independent of partitioning or task
    * order (spec-pinned). Each shard is written by exactly one task
    * (`repartition(nShards, shard)` hash-places whole shards; a task
    * that receives several shards streams them sequentially), and the
    * member stream is spilled through a sorted iterator, not
    * collected. */
  def writeTarShards(df: DataFrame, idCol: String, payloadCol: String,
                     nShards: Int, outDir: String,
                     salt: String = ""): DataFrame =
    writeTarShardsMulti(df, idCol, Seq("txt" -> col(payloadCol)), nShards,
      outDir, salt)

  /** Multi-member WebDataset samples: each document key contributes one
    * tar member per `(extension, column)` pair — `<id>.txt`,
    * `<id>.json`, `<id>.cls`, … written ADJACENTLY in the given
    * extension order, which is the WebDataset grouping contract (a
    * loader assembles a sample from consecutive members sharing a
    * basename). Same determinism and placement as [[writeTarShards]];
    * `n_entries` counts members (docs × extensions). NULL member values
    * write empty payloads — a sample never silently loses a field. */
  def writeTarShardsMulti(df: DataFrame, idCol: String,
                          members: Seq[(String, Column)], nShards: Int,
                          outDir: String, salt: String = ""): DataFrame = {
    require(members.nonEmpty, "need at least one (extension, column) member")
    require(members.map(_._1).distinct.length == members.length,
      s"duplicate member extensions in ${members.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    val exts = members.map(_._1)
    val rows = df.select(shardOf(col(idCol), nShards, salt).as("shard"),
        col(idCol).cast("long").as("id"),
        array(members.map(_._2.cast("string")): _*).as("payloads"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Int, Long, Seq[String])]
    val out = rows.mapPartitions { it =>
      val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
      var shard = -1
      var os: java.io.OutputStream = null
      var md: java.security.MessageDigest = null
      var bytes = 0L
      var entries = 0L
      def write(b: Array[Byte]): Unit = { os.write(b); md.update(b); bytes += b.length }
      def close(): Unit = if (os != null) {
        write(new Array[Byte](1024)) // two zero trailer blocks
        os.close()
        done += ((shard, entries, bytes,
          md.digest().map("%02x".format(_)).mkString))
        os = null
      }
      it.foreach { case (s, id, payloads) =>
        if (s != shard) {
          close()
          shard = s
          os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
            new java.io.File(outDir, f"shard-$s%05d.tar")))
          md = java.security.MessageDigest.getInstance("MD5")
          bytes = 0L; entries = 0L
        }
        exts.zip(payloads).foreach { case (ext, payload) =>
          val data = (if (payload == null) "" else payload)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          write(ustarHeader(s"$id.$ext", data.length.toLong))
          write(data)
          val pad = (512 - data.length % 512) % 512
          if (pad > 0) write(new Array[Byte](pad))
          entries += 1
        }
      }
      close()
      done.iterator
    }.toDF("shard", "n_entries", "tar_bytes", "tar_md5")
    out.orderBy("shard")
  }

  /** One 512-byte POSIX-ustar header: zero-padded octal numerics, NUL
    * terminators, mtime/uid/gid 0, mode 0644, typeflag '0', magic
    * "ustar\0" version "00", checksum over the header with the chksum
    * field as spaces (the POSIX rule). */
  private[operators] def ustarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"tar name too long: $name")
    // f"%011o" widens past 11 digits at 8 GiB and would silently
    // overwrite the mtime field with a corrupt header.
    require(size >= 0 && size < (1L << 33),
      s"tar member too large for an 11-digit octal size field: $size")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)                       // name[100]
    put(100, "0000644\u0000")          // mode[8]
    put(108, "0000000\u0000")          // uid[8]
    put(116, "0000000\u0000")          // gid[8]
    put(124, f"$size%011o\u0000")      // size[12]
    put(136, "00000000000\u0000")      // mtime[12] = epoch 0
    put(148, "        ")               // chksum[8]: spaces while summing
    h(156) = '0'                       // typeflag: regular file
    put(257, "ustar\u000000")        // magic[6] = ustar+NUL, version[2] = 00
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")       // chksum: 6 octal, NUL, space
    h
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
