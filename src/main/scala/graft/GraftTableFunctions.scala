package graft

import graft.operators.{Chunker, Curation, Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL table-function surface for the pipeline operators — the curation
  * path for SQL-first users. The scalar kernels ([[GraftFunctions]])
  * cover per-row work; these cover the WHOLE-RELATION operators (pair
  * screens, dedup, splits, chunking, quality gating), callable as
  * `SELECT * FROM fn('table', ...)` with a table or temp-view name.
  *
  * Registration mirrors [[GraftFunctions]]:
  *  - at session build: `.withExtensions(new GraftExtensions)` /
  *    `spark.sql.extensions=graft.GraftExtensions`;
  *  - on a live session: `GraftTableFunctions.register(spark)`.
  *
  * Each builder resolves its first argument through
  * `SparkSession.active.table` (temp views and catalog tables alike) and
  * returns the SAME logical plan the Scala API builds — Catalyst then
  * optimizes the composed query as one plan (the screen's filters and
  * projections still push down into the scan), so the SQL route costs
  * nothing over the Scala route.
  *
  * Registered table functions:
  *  - `minhash_pairs(table, id, text [, numHashes, bands, shingle, maxBucket])`
  *    — MinHash-LSH near-duplicate candidate pairs (a, b)
  *  - `dedup_exact(table, id, text)` — rows surviving exact
  *    (hash-groupBy) dedup, keep-first semantics
  *  - `hash_split(table, id, 'train:0.9,val:0.05,test:0.05' [, salt])`
  *    — all input columns + a deterministic `split` label
  *    (append-stable: a row's split never changes as the corpus grows)
  *  - `token_chunks(table, id, text, chunkTokens, overlap)` — fixed-size
  *    word windows: (id, chunk_id, chunk_text, n_chunk_tokens)
  *  - `quality_gate(table, text)` — rows passing the Gopher quality
  *    gate at the paper's thresholds
  *  - `read_jsonl(path)` — schema-validated documents JSONL/gz ingest
  *    (valid rows; [[graft.core.Tables.readJsonl]] for quarantine)
  *  - `read_warc(path)` — WARC crawl-record ingest
  *    ([[graft.sources.Warc.read]])
  *  - `read_csv(path)` — schema-validated documents CSV ingest
  *    (valid rows; [[graft.core.Tables.readCsvLines]] for quarantine)
  *  - `near_dedup(table, id, text)` — rows surviving near-duplicate
  *    removal (LSH pair screen → connected components → keep the
  *    lowest-id member per cluster). The iterative component labeling
  *    is wrapped in a [[graft.plans.DeferredRelation]]: planning —
  *    `EXPLAIN`, `DESCRIBE`, view re-resolution — is side-effect-free,
  *    and the screen + CC jobs fire once at the query's first action
  *    (memoized per plan instance). Semantics match
  *    `Dedup.keepCanonical ∘ connectedComponents ∘ minhashLshPairs`
  *    exactly.
  *
  *    Memo lifetime = the STATEMENT's logical plan, not the session:
  *    a DataFrame held across actions keeps serving the loser set its
  *    FIRST action computed, even if the underlying table is replaced
  *    in between (a snapshot-at-first-action view — deliberate, so
  *    `df.count(); df.show()` agree with each other). To observe
  *    table changes, issue the SQL again: each new statement parses a
  *    fresh TVF call with a fresh memo cell. GraftExtensionsSpec pins
  *    both halves of this contract.
  *
  * Each function's `table` argument is either a name string literal
  * (`'docs'` — temp views and catalog tables alike) or a relation
  * argument (`TABLE(docs)` / `TABLE(SELECT ...)`), so a subquery or CTE
  * feeds straight in without a temp-view detour.
  */
object GraftTableFunctions {

  /** First argument: a table/temp-view NAME ('docs') or a relation
    * argument (`TABLE(docs)`, `TABLE(SELECT ... FROM docs)`) — the
    * latter lets SQL users feed a subquery or CTE straight into a
    * pipeline function without materializing a temp view first. */
  private def table(fn: String, args: Seq[Expression], i: Int): DataFrame =
    args(i) match {
      case f: FunctionTableSubqueryArgumentExpression =>
        ColumnBridge.ofRows(SparkSession.active, f.plan)
      case Literal(s, StringType) if s != null =>
        SparkSession.active.table(s.toString)
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a table name string literal " +
          s"or a TABLE(...) argument, got $other")
    }

  private def strArg(fn: String, args: Seq[Expression], i: Int): String =
    args(i) match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def intArg(fn: String, args: Seq[Expression], i: Int,
                     default: => Int): Int =
    args.lift(i) match {
      case None => default
      case Some(Literal(v: Int, IntegerType)) => v
      // toIntExact: an out-of-Int-range literal must fail loud, not wrap
      case Some(Literal(v: Long, LongType)) =>
        try java.lang.Math.toIntExact(v)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$fn: argument ${i + 1} ($v) exceeds Int range") }
      case Some(other) => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** `'train:0.9,test:0.1'` → Seq(("train", 0.9), ("test", 0.1)). */
  private[graft] def parseWeights(spec: String): Seq[(String, Double)] =
    spec.split(",").toSeq.map { part =>
      part.split(":") match {
        case Array(name, w) => (name.trim, w.trim.toDouble)
        case _ => throw new IllegalArgumentException(
          s"hash_split: malformed weight entry '$part' " +
            "(expected 'name:weight,name:weight,...')")
      }
    }

  val all: Seq[(String, String, Seq[Expression] => LogicalPlan)] = Seq(
    ("minhash_pairs",
      "_FUNC_(table, id, text[, numHashes, bands, shingle, maxBucket]) - " +
        "MinHash-LSH near-duplicate candidate pairs (a, b)",
      (args: Seq[Expression]) => {
        require(args.length >= 3 && args.length <= 7,
          s"minhash_pairs expects 3-7 arguments, got ${args.length}")
        plan(Dedup.minhashLshPairs(table("minhash_pairs", args, 0),
          strArg("minhash_pairs", args, 1), strArg("minhash_pairs", args, 2),
          numHashes = intArg("minhash_pairs", args, 3, 8),
          bands = intArg("minhash_pairs", args, 4, 4),
          shingle = intArg("minhash_pairs", args, 5, 3),
          maxBucket = intArg("minhash_pairs", args, 6, 10000)))
      }),
    ("dedup_exact",
      "_FUNC_(table, id, text) - rows surviving exact dedup (keep-first)",
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"dedup_exact expects 3 arguments, got ${args.length}")
        plan(Dedup.exactKeepFirst(table("dedup_exact", args, 0),
          strArg("dedup_exact", args, 1), strArg("dedup_exact", args, 2)))
      }),
    ("hash_split",
      "_FUNC_(table, id, 'train:0.9,test:0.1'[, salt]) - deterministic " +
        "append-stable split label on every row",
      (args: Seq[Expression]) => {
        require(args.length == 3 || args.length == 4,
          s"hash_split expects 3-4 arguments, got ${args.length}")
        val df = table("hash_split", args, 0)
        val weights = parseWeights(strArg("hash_split", args, 2))
        val salt =
          if (args.length == 4) strArg("hash_split", args, 3) else ""
        plan(df.withColumn("split", Sampling.splitColumn(
          col(strArg("hash_split", args, 1)), weights, salt)))
      }),
    ("token_chunks",
      "_FUNC_(table, id, text, chunkTokens, overlap) - fixed-size word " +
        "windows (id, chunk_id, chunk_text, n_chunk_tokens)",
      (args: Seq[Expression]) => {
        require(args.length == 5,
          s"token_chunks expects 5 arguments, got ${args.length}")
        plan(Chunker.chunk(table("token_chunks", args, 0),
          strArg("token_chunks", args, 1), strArg("token_chunks", args, 2),
          chunkTokens = intArg("token_chunks", args, 3, sys.error("unreachable")),
          overlap = intArg("token_chunks", args, 4, sys.error("unreachable"))))
      }),
    ("quality_gate",
      "_FUNC_(table, text[, minWords, maxWords, minStopHits]) - rows " +
        "passing the Gopher quality gate (defaults = the paper's " +
        "thresholds: 50, 100000, 2)",
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 5,
          s"quality_gate expects 2-5 arguments, got ${args.length}")
        val df = table("quality_gate", args, 0)
        plan(df.filter(Curation.gopherPass(
          col(strArg("quality_gate", args, 1)),
          minWords = intArg("quality_gate", args, 2, 50).toLong,
          maxWords = intArg("quality_gate", args, 3, 100000).toLong,
          minStopHits = intArg("quality_gate", args, 4, 2).toLong)))
      }),
    ("read_jsonl",
      "_FUNC_(path) - schema-validated documents JSONL read (plain or " +
        ".gz; valid rows only — use Tables.readJsonl with a " +
        "quarantineDir to capture corrupt lines)",
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"read_jsonl expects 1 argument, got ${args.length}")
        plan(graft.core.Tables.documentsJsonl(SparkSession.active,
          strArg("read_jsonl", args, 0)))
      }),
    ("read_warc",
      "_FUNC_(path) - WARC crawl records (file, warc_type, record_id, " +
        "target_uri, warc_date, content_type, content_length, payload)",
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"read_warc expects 1 argument, got ${args.length}")
        plan(graft.sources.Warc.read(SparkSession.active,
          strArg("read_warc", args, 0)))
      }),
    ("read_csv",
      "_FUNC_(path) - schema-validated documents CSV read (headerless, " +
        "columns by documents-schema position; plain or .gz; valid rows " +
        "only — use Tables.readCsvLines with a quarantineDir to capture " +
        "corrupt lines)",
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"read_csv expects 1 argument, got ${args.length}")
        plan(graft.core.Tables.readCsvLines(SparkSession.active,
          strArg("read_csv", args, 0)))
      }),
    ("near_dedup",
      "_FUNC_(table, id, text) - rows surviving near-duplicate removal: " +
        "MinHash-LSH pair screen -> connected components -> keep the " +
        "lowest-id member of each near-dup cluster. The screen + " +
        "component jobs run at the query's FIRST ACTION (memoized per " +
        "plan), never at EXPLAIN/DESCRIBE/view-resolution time.",
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"near_dedup expects 3 arguments, got ${args.length}")
        val df = table("near_dedup", args, 0)
        val id = strArg("near_dedup", args, 1)
        val text = strArg("near_dedup", args, 2)
        // CC is iterative (driver-side jobs just to know its output), so
        // the loser set is a DeferredRelation: planning this function is
        // side-effect-free, and the jobs fire once at first execution
        val losersSchema = df.select(col(id).as("__loser")).schema
        // connectedComponents emits LONG ids; the deferred leaf's
        // positional-type contract declares the SOURCE id type, so cast
        // back (lossless — these are the original id values). Without
        // it an int-id table reads 8-byte longs through a 4-byte
        // declared column.
        val idType = losersSchema.head.dataType
        val thunk = () => {
          val comps = Dedup.connectedComponents(
            Dedup.minhashLshPairs(df, id, text))
          comps.filter(col("id") =!= col("comp"))
            .select(col("id").cast(idType).as("__loser"))
        }
        val losers = ColumnBridge.ofRows(SparkSession.active,
          graft.plans.DeferredRelation(
            DataTypeUtils.toAttributes(losersSchema),
            s"near_dedup($id) losers", thunk))
        plan(df.join(losers, col(id) === col("__loser"), "left_anti"))
      }))

  /** Register every pipeline table function on a live session (and the
    * planner strategy the deferred `near_dedup` leaf needs). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      ColumnBridge.registerTempTableFunction(spark, name, builder)
    }
    val extra = spark.experimental.extraStrategies
    if (!extra.contains(graft.plans.DeferredRelationStrategy))
      spark.experimental.extraStrategies =
        extra :+ graft.plans.DeferredRelationStrategy
  }
}
