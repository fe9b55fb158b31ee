package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver's deterministic parquet testdata (TESTDATA.md)
  * and the engine's canonical vector-table schema (SURVEY.md §1.4).
  *
  * The reference's single logical record is the `Node`
  * (`/root/reference/src/vector_db/types.py:5-10`): id + fixed-dim
  * float32 embedding + schemaless metadata + optional content. Our
  * canonical DataFrame schema mirrors it; the two-layer memmap split
  * (`storage.py:100-181`) becomes Parquet column pruning for free.
  */
object Tables {

  /** Canonical vector-store schema (the engine's one logical table).
    *
    * `metadata` is the fast, filterable string map; `metadata_json` is
    * the raw-fidelity column (SURVEY §1.2): the reference's metadata is
    * schemaless JSON whose values can be ints/lists/nested objects
    * (`tests/integration/test_embed_api.py:153-160`; storage serializes
    * arbitrary JSON, `storage.py:213,221-222`), which a string map can't
    * represent. Non-string and nested values live verbatim in
    * `metadata_json` and are filterable via `get_json_object`
    * ([[graft.operators.Search.metadataJsonFilter]]). */
  val nodeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("metadata_json", StringType, nullable = true),
    StructField("is_deleted", BooleanType, nullable = false)))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** `events.ts` has shipped in two parquet layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so it is read as a nanos-long (legacy conf) and
    * rebuilt as a microsecond timestamp (`ts div 1000`, integral
    * division — a double division would lose precision above 2^53 ns) —
    * and plain TIMESTAMP(MICROS) without UTC adjustment, which arrives
    * as TIMESTAMP_NTZ and only needs a cast to the session-local type
    * (identity on the stored micros under the UTC session timezone every
    * entrypoint pins). Dispatch on the schema actually read so both
    * generations produce the identical TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  /** Streaming variant of [[events]]: the same two-generation `ts`
    * dispatch over a file-source stream (schema comes from one batch
    * footer read; the stream itself never touches the driver).
    *
    * Layout dispatch: `events.parquet` ships as a single FILE in the
    * driver's testdata but as a part-file DIRECTORY everywhere a real
    * writer produced it (and that is the only shape that exists at
    * cluster scale). The single-file case needs a glob filter because
    * the stream source lists the PARENT dir; the directory case must
    * NOT use that filter — it matches against part-file names, so the
    * glob silently yields an empty stream (caught by the sf1 tier:
    * three b10 queries read zero rows from a directory-shaped corpus). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = load(spark, dir, "events").schema
    // Resolve layout through the Hadoop FileSystem API, not java.io.File:
    // File.isDirectory is false for any non-local path (hdfs://, s3a://),
    // which would silently re-take the glob branch — the empty-stream bug
    // this dispatch exists to fix — on exactly the filesystems where the
    // directory layout is the only one that exists.
    val tablePath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw =
      if (fs.getFileStatus(tablePath).isDirectory)
        spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  /** The `documents` table's canonical column layout — what
    * [[documentsJsonl]] validates arriving JSON lines against. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** JSONL ingest front door: read newline-delimited JSON (plain or
    * `.gz` — Spark's text source decompresses by extension, so a
    * directory of `.jsonl.gz` shards works unchanged) against an
    * expected schema,
    * quarantining corrupt lines instead of nulling or dropping them
    * silently.
    *
    * A line is CORRUPT when it is not parseable JSON under `schema`
    * (malformed syntax, or a type that won't coerce — `from_json`
    * yields a null struct) or when any of `required` is null after
    * parsing (missing key, JSON null, or per-field coercion failure).
    * With `quarantineDir` set, the raw offending lines are written
    * there verbatim (overwrite, text format) so ingest debugging sees
    * the original bytes — one extra pass over the text scan, the
    * standard quarantine trade; pass None to skip the write and get
    * the good rows in a single lazy scan.
    *
    * Returns the VALID rows, column-pruned and typed to `schema`.
    * Scale: a pure per-line map over a splittable listing (gz files
    * parallelize per-file) — no shuffle, no driver state; filters on
    * the result push into the JSON parse via Spark's JSON pruning. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema,
                required: Seq[String] = Seq("doc_id", "text"),
                quarantineDir: Option[String] = None): DataFrame =
    readLines(spark, path, schema, required, quarantineDir,
      from_json(col("value"), schema))

  /** [[readJsonl]] pinned to the documents layout — the jsonl.gz twin
    * of [[documents]]. */
  def documentsJsonl(spark: SparkSession, path: String,
                     quarantineDir: Option[String] = None): DataFrame =
    readJsonl(spark, path, documentsSchema, Seq("doc_id", "text"),
      quarantineDir)

  /** CSV twin of [[readJsonl]] — same corrupt-line quarantine contract
    * over comma-separated lines (headerless; columns by schema
    * position; `.gz` transparent like the text source underneath).
    * A line is corrupt when `from_csv` can't parse it under `schema`
    * (broken quoting, row-level malformation) or any `required` column
    * is null afterwards (missing field, empty value — the CSV
    * `nullValue` default treats `""` as null — or a type that won't
    * coerce). `options` passes through to the CSV parser (`sep`,
    * `quote`, `nullValue`, ...). Corrupt originals land verbatim in
    * `quarantineDir`. */
  def readCsvLines(spark: SparkSession, path: String,
                   schema: StructType = documentsSchema,
                   required: Seq[String] = Seq("doc_id", "text"),
                   quarantineDir: Option[String] = None,
                   options: Map[String, String] = Map.empty): DataFrame =
    readLines(spark, path, schema, required, quarantineDir,
      from_csv(col("value"), schema, Map("mode" -> "PERMISSIVE") ++ options))

  /** Shared line-ingest pipeline behind [[readJsonl]] / [[readCsvLines]]
    * — only the parser expression differs, and the quarantine contract
    * (required-column precheck, null-struct-or-null-required corruption
    * predicate, verbatim overwrite write, column-pruned valid rows)
    * must stay byte-identical between the two front doors. */
  private def readLines(spark: SparkSession, path: String,
                        schema: StructType, required: Seq[String],
                        quarantineDir: Option[String],
                        parser: org.apache.spark.sql.Column): DataFrame = {
    val bad = required.filterNot(schema.fieldNames.contains)
    require(bad.isEmpty, s"required columns $bad missing from schema")
    val parsed = spark.read.text(path).select(col("value"), parser.as("__p"))
    val isCorrupt = col("__p").isNull ||
      required.map(c => col(s"__p.$c").isNull).reduce(_ || _)
    quarantineDir.foreach { q =>
      parsed.filter(isCorrupt).select(col("value"))
        .write.mode("overwrite").text(q)
    }
    parsed.filter(!isCorrupt).select(col("__p.*"))
  }

  /** Adapt the driver's `embeddings` table to the canonical node schema,
    * using `label` as a filterable metadata key (FIXTURES.md §A). */
  def embeddingsAsNodes(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir).select(
      col("vec_id").as("id"),
      col("embedding"),
      lit(null).cast(StringType).as("content"),
      map(lit("label"), col("label").cast(StringType)).as("metadata"),
      to_json(map(lit("label"), col("label").cast(StringType))).as("metadata_json"),
      lit(false).as("is_deleted"))

  /** Ingest validation, mirroring the reference's hard dim-check at write
    * (`inference/mmap_vector_store.py:100-107`): rows whose embedding is
    * null or has the wrong dimension fail the job (strict=true) or are
    * dropped (strict=false). Runs distributed — no driver collect. */
  def validateDim(df: DataFrame, embeddingCol: String, dim: Int, strict: Boolean = true): DataFrame = {
    val ok = col(embeddingCol).isNotNull && size(col(embeddingCol)) === dim
    if (strict) {
      // raise_error inside a when() keeps the check codegen'd and lazy.
      df.withColumn(embeddingCol,
        when(ok, col(embeddingCol))
          .otherwise(raise_error(concat(
            lit(s"Embedding dimension mismatch: expected $dim, got "),
            coalesce(size(col(embeddingCol)).cast(StringType), lit("null"))))))
    } else df.filter(ok)
  }
}
