package graft.operators

import graft.expressions.FloatKernels
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (multi-table) random-hyperplane LSH over embedding columns —
  * the bucketed candidate generator for embedding near-dup at corpus
  * scale, and an ANN scale path next to IVF partition pruning and HNSW
  * (SURVEY §2.1 O6).
  *
  * Amplification: L independent tables of b bits each. Within a table
  * the b bits AND-combine (all must agree → high precision); across
  * tables collisions OR-combine (any table suffices → recall
  * 1-(1-p^b)^L for per-bit agreement p = 1 - θ/π at angle θ). A single
  * AND-only signature (L=1) has recall p^b ≈ 0 at moderate similarity —
  * the round-2 failure mode this banding replaces; the construction is
  * the standard one from the published LSH literature (Indyk–Motwani
  * amplification; Charikar sign-random-projection for the per-bit hash).
  *
  * Deterministic end-to-end: seeded plane generation plus the
  * engine-wide left-to-right float→double dot fold on both driver and
  * executor sides ([[graft.expressions.LshSigUtil]]).
  *
  * Scale: signatures are one codegen'd scan (all L·b plane dots in a
  * single kernel call per row, no shuffle); search prunes to the probed
  * buckets per table; near-dup pairing shuffles one row per (table,
  * bucket) — never all-pairs — with a `maxBucket` guard on degenerate
  * buckets. Choose b by corpus size (buckets/table = 2^b; bigger b →
  * smaller buckets, lower per-table recall) and L by the recall target.
  */
object Lsh {

  val SigsCol = "lsh_sigs"
  val BucketCol = "lsh_bucket"

  /** L = planes.length / bitsPerTable tables; table t owns planes
    * [t·b, (t+1)·b). */
  case class Model(planes: Array[Array[Float]], bitsPerTable: Int) {
    require(planes.nonEmpty && planes.length % bitsPerTable == 0,
      s"${planes.length} planes not divisible into $bitsPerTable-bit tables")
    def nBits: Int = planes.length
    def nTables: Int = planes.length / bitsPerTable
    def dim: Int = planes.headOption.map(_.length).getOrElse(0)
  }

  /** Single-table model (AND-only — precision path; use [[fitBanded]]
    * for any recall-sensitive workload). */
  def fit(dim: Int, nBits: Int, seed: Long = 42L): Model =
    fitBanded(dim, bitsPerTable = nBits, nTables = 1, seed = seed)

  /** Seeded Gaussian hyperplanes for L tables × b bits (data-independent
    * — no training scan). */
  def fitBanded(dim: Int, bitsPerTable: Int, nTables: Int,
                seed: Long = 42L): Model = {
    require(bitsPerTable > 0 && bitsPerTable <= 30,
      s"bitsPerTable must be in [1, 30], got $bitsPerTable")
    require(nTables > 0, s"nTables must be positive, got $nTables")
    require(dim > 0, s"dim must be positive, got $dim")
    val rnd = new java.util.Random(seed)
    Model(Array.fill(nTables * bitsPerTable)(
      Array.fill(dim)(rnd.nextGaussian().toFloat)), bitsPerTable)
  }

  /** Adds `lsh_sigs` (array<int>, one signature per table) and
    * `lsh_bucket` (table 0's signature — the single-table view). */
  def assign(df: DataFrame, embCol: String, model: Model): DataFrame =
    df.withColumn(SigsCol,
        FloatKernels.hyperplaneSigs(col(embCol), model.planes, model.bitsPerTable))
      .withColumn(BucketCol, col(SigsCol).getItem(0))

  /** Driver-side per-table signatures of one vector — the same
    * float→double left-to-right fold as the codegen kernel, so a query
    * lands in exactly the buckets its row would. */
  def signatures(v: Seq[Float], model: Model): Array[Int] = {
    require(v.length == model.dim,
      s"vector dim ${v.length} != model dim ${model.dim}")
    val out = new Array[Int](model.nTables)
    var p = 0
    while (p < model.planes.length) {
      val h = model.planes(p)
      var acc = 0.0
      var i = 0
      while (i < h.length) { acc += v(i).toDouble * h(i).toDouble; i += 1 }
      if (acc >= 0) out(p / model.bitsPerTable) |= 1 << (p % model.bitsPerTable)
      p += 1
    }
    out
  }

  /** Table-0 signature (single-table compatibility view). */
  def signature(v: Seq[Float], model: Model): Int = signatures(v, model)(0)

  /** Buckets probed for one table: the signature itself plus every
    * signature within Hamming distance `probeBits` (multi-probe —
    * boundary-crossing tolerance without extra tables). */
  private[operators] def probes(sig: Int, bits: Int, probeBits: Int): Seq[Int] = {
    val one = (0 until bits).map(j => sig ^ (1 << j))
    val two = if (probeBits < 2) Seq.empty else
      for { j <- 0 until bits; l <- j + 1 until bits } yield sig ^ (1 << j) ^ (1 << l)
    sig +: (one ++ two)
  }

  /** Persist a model's plane matrix (one row per plane, components as
    * array<float>) — the B11-style artifact that lets a store serve
    * repeated LSH queries from PERSISTED signatures instead of
    * recomputing every row's L·b plane dots per call. */
  def save(m: Model, path: String,
           spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    m.planes.toSeq.zipWithIndex
      .map { case (p, i) => (i, m.bitsPerTable, p.toSeq) }
      .toDF("i", "bits_per_table", "plane")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).orderBy("i").collect()
    require(rows.nonEmpty, s"empty LSH model at $path")
    Model(rows.map(_.getSeq[Float](2).toArray), rows.head.getInt(1))
  }

  /** Bucket-probe predicate for one query over an assigned/persisted
    * `lsh_sigs` column — candidates are rows matching ANY table's
    * probed bucket set. Exactly the cut [[search]] applies, factored
    * out so a signature TABLE (no vectors) can be filtered without
    * re-deriving signatures from embeddings. */
  def probeCondition(model: Model, query: Seq[Float],
                     probeBits: Int = 2): Column = {
    val sigs = signatures(query, model)
    (0 until model.nTables).map { t =>
      col(SigsCol).getItem(t)
        .isin(probes(sigs(t), model.bitsPerTable, probeBits): _*)
    }.reduce(_ || _)
  }

  /** Approximate top-k: candidates from any table whose probed bucket
    * set contains the row's signature, exact (dist, id) rerank on the
    * survivors. Per-table probe count is 1 + b + C(b,2) at the default
    * `probeBits = 2` — a fixed, tiny fraction of the 2^b buckets. */
  def search(assigned: DataFrame, model: Model, idCol: String, embCol: String,
             query: Seq[Float], k: Int, probeBits: Int = 2,
             filter: Option[Column] = None): DataFrame = {
    val cond = probeCondition(model, query, probeBits)
    // metadata pre-filter composes WITH the bucket probe (both conjuncts
    // reach the scan): filtered-out rows are structurally excluded —
    // the reference's exclusion contract (test_search_api.py:149-172)
    val base = filter.fold(assigned)(assigned.filter)
    Search.knnExact(base.filter(cond), idCol, embCol, query, k)
  }

  /** Near-duplicate candidate pairs with exact cosine rerank, computed
    * IN the bucket: rows are bucketed per (table, signature) carrying
    * (id, vector) structs, each bucket's C(s,2) pairs are generated and
    * cosine-scored inside the same stage, and only pairs clearing the
    * threshold survive to the cross-table distinct. Nothing quadratic
    * ever reaches a shuffle: candidate scoring is a generator + codegen
    * dot in one pipelined stage, the distinct sees only true near-dups
    * (a tiny set by definition of the threshold), and the
    * join-back-to-vectors of the previous formulation disappears
    * entirely. The same double-precision left-to-right dot fold runs on
    * every occurrence of a pair, so the cross-table distinct dedups on
    * bit-identical scores.
    *
    * The per-table shuffle carries each vector L times (once per
    * table) — linear in corpus size with a small constant, the standard
    * LSH trade against the candidate-pair shuffles it replaces.
    *
    * `maxBucket` bounds the quadratic intra-bucket fan-out: a bucket
    * holding more docs than this (a degenerate hash region — at corpus
    * scale usually zero/boilerplate vectors) is dropped rather than
    * exploded into O(n²) candidate pairs. Scale-safe by default; raise
    * it only for exhaustive small-data runs. */
  def cosineNearDupPairs(assigned: DataFrame, idCol: String, embCol: String,
                         threshold: Double, maxBucket: Int = 10000): DataFrame = {
    import graft.functions.VectorFunctions._
    val buckets = assigned
      .select(struct(col(idCol).as("id"), col(embCol).as("emb")).as("__item"),
        posexplode(col(SigsCol)).as(Seq("__table", "__sig")))
      .groupBy("__table", "__sig")
      .agg(collect_list(col("__item")).as("items"))
      .filter(size(col("items")) > 1 && size(col("items")) <= maxBucket)
    // struct arrays sort lexicographically by leading field → pairs are
    // ordered by id: a < b by construction
    Dedup.intraBucketPairs(buckets, "items", "x", "y")
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.emb").as("ea"), col("y.emb").as("eb"))
      .withColumn("__na", norm(col("ea")))
      .withColumn("__nb", norm(col("eb")))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / (col("__na") * col("__nb")))
      // zero-norm guard: NaN sorts above every double in Spark, so 0/0
      // pairs would otherwise pass any threshold. a =!= b: a re-ingested
      // id with a different embedding would self-pair (see
      // Dedup.intraBucketPairs struct caveat)
      .filter(col("a") =!= col("b") &&
        col("__na") > 0 && col("__nb") > 0 && col("cos_sim") >= threshold)
      .select("a", "b", "cos_sim")
      .distinct()
  }
}
