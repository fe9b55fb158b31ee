package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines:
  * exact (content hash), MinHash + LSH banding, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup. Engine extensions beyond the reference
  * surface (the reference stores unique ids only; these are the dedup
  * semantics a 100 TB corpus pipeline needs).
  *
  * Scale design:
  *  - exact dedup: single hash-shuffle on a 16-byte key, map-side combine.
  *  - MinHash/LSH: signatures are per-row scans; candidate generation
  *    shuffles on (band_id, band_hash) buckets only — never all-pairs.
  *  - SimHash: per-row scan; near-dup via banding on hash prefixes.
  *  - cosine near-dup: all-pairs only within IVF clusters (bucketed
  *    self-join), not globally.
  */
object Dedup {

  /** Exact dedup: md5 content hash, keep the lowest id per group. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows that survive exact dedup (keep-first semantics). */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct lowercase word tokens of a text column. */
  private def wordSet(textCol: Column): Column =
    array_distinct(split(lower(textCol), "\\s+"))

  /** Distinct word n-gram shingles (shingle=1 degenerates to the word
    * set). Shingling is what makes minhash discriminate on corpora with
    * small shared vocabularies. */
  def shingleSet(textCol: Column, shingle: Int): Column =
    if (shingle <= 1) wordSet(textCol)
    else {
      val toks = split(lower(textCol), "\\s+")
      array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - (shingle - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(shingle)))))
    }

  /** MinHash signature: per seed, the minimum of md5(seed|shingle) over
    * the document's distinct shingles. Lexicographic min over a uniform
    * hex string is a valid min-hash; identical in any engine with md5.
    * Output column `minhash`: array<string> of length numHashes. */
  def minhashSignature(df: DataFrame, textCol: String, numHashes: Int = 8,
                       shingle: Int = 3): DataFrame = {
    val sig = transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleSet(col(textCol), shingle),
        t => md5(concat(seed.cast("string"), lit("|"), t)))))
    df.withColumn("minhash", sig)
  }

  /** LSH banding over the MinHash signature: band hash = md5 of the
    * concatenated band slice. Docs sharing any band hash are candidate
    * near-duplicates. Returns candidate pairs (a < b), distinct. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 8, bands: Int = 4, shingle: Int = 3): DataFrame = {
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide by bands ($bands)")
    val rowsPerBand = numHashes / bands
    val signed = minhashSignature(df, textCol, numHashes, shingle)
      .select(col(idCol).as("__id"), col("minhash"))
    val banded = signed.select(col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|", slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))))))
          .as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"), col("__id").as("a"))
    val b = banded.select(col("band_id"), col("band_hash"), col("__id").as("b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** SimHash (64-bit, via xxhash64): sign-sum of token hash bits.
    * Per-row scan, no shuffle. Output `simhash`: bigint. */
  def simhash(df: DataFrame, textCol: String): DataFrame = {
    val tokens = wordSet(col(textCol))
    // bitsOf(t)(i) = bit i of hash(t) ? +1 : -1  (static 64-column array)
    def bitsOf(t: Column): Column = array((0 until 64).map(i =>
      when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)): _*)
    // counts(i) = Σ_tokens bitsOf(token)(i)
    val counts = aggregate(tokens, array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, bitsOf(t), (c, b) => c + b))
    // simhash = OR_{i: counts(i) > 0} 2^i  (as signed 64-bit)
    val sim = (0 until 64).map(i =>
        when(element_at(col("__simhash_counts"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("__simhash_counts", counts)
      .withColumn("simhash", sim)
      .drop("__simhash_counts")
  }

  /** Hamming distance between two simhash columns (near-dup if small). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Word n-gram Jaccard similarity pairs ≥ threshold. Candidate pairs
    * share at least one n-gram (inverted-index join), so the all-pairs
    * product is never materialized. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val grams = df.select(col(idCol).as("__id"),
        array_distinct(transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(n))))).as("grams"))
      .select(col("__id"), explode(col("grams")).as("gram"))
    val sizes = grams.groupBy("__id").agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("gram"), col("__id").as("a"))
      .join(grams.select(col("gram"), col("__id").as("b")), "gram")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("__id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard", col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs (similarity ≥ threshold).
    * Brute all-pairs within the given DataFrame — callers at scale pass
    * IVF-bucketed partitions (join within cluster_id), not the full table. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                         threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a"), col(embCol).as("ea"))
    val b = df.select(col(idCol).as("b"), col(embCol).as("eb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos_sim", cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= threshold)
      .select("a", "b", "cos_sim")
  }

  /** Scale path: cosine near-dup bucketed by IVF cluster — all-pairs only
    * within each cluster (candidate loss at cluster borders is the usual
    * ANN recall trade; raise k to shrink clusters). */
  def cosineNearDupBucketed(assigned: DataFrame, idCol: String, embCol: String,
                            threshold: Double): DataFrame = {
    val a = assigned.select(col(Ivf.ClusterCol), col(idCol).as("a"), col(embCol).as("ea"))
    val b = assigned.select(col(Ivf.ClusterCol), col(idCol).as("b"), col(embCol).as("eb"))
    a.join(b, Seq(Ivf.ClusterCol))
      .filter(col("a") < col("b"))
      .withColumn("cos_sim", cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= threshold)
      .select("a", "b", "cos_sim")
  }
}
