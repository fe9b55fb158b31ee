package graft

import graft.expressions.{DotFloat, HammingLongs, L2SqFloat, LnDouble, SignPackFloat, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Spark SQL surface for the engine's codegen kernels.
  *
  * Two registration paths:
  *  - at session build: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *    or `.withExtensions(new GraftExtensions)`;
  *  - on a live session: `GraftFunctions.register(spark)`.
  *
  * Registered functions (vectors are array<float>, results Double):
  *  - l2_sq(a, b), l2_dist(a, b)  — squared / plain Euclidean distance
  *  - dot_product(a, b)           — inner product
  *  - cosine_sim(a, b)            — dot/(|a||b|)
  *  - ln_libm(x)                  — libm-exact natural log
  *  - word_shingles(text, n)      — distinct lowercase word n-grams
  *  - sign_pack(v), hamming_dist(a, b) — BQ code + Hamming
  *  - lang_id / quality_score / token_count / subword_count (text)
  *  - simhash64(text), doc_fingerprint(text, shingle)
  *  - blocklist_hits(text, p1, ...) — Aho-Corasick multi-pattern hits
  */
object GraftFunctions {

  private def two(name: String, f: (Expression, Expression) => Expression)
                 (args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("l2_sq", "_FUNC_(a, b) - squared L2 distance of two float vectors",
      two("l2_sq", L2SqFloat(_, _)) _),
    ("l2_dist", "_FUNC_(a, b) - Euclidean distance of two float vectors",
      two("l2_dist", (a, b) => Sqrt(L2SqFloat(a, b))) _),
    ("dot_product", "_FUNC_(a, b) - inner product of two float vectors",
      two("dot_product", DotFloat(_, _)) _),
    ("cosine_sim", "_FUNC_(a, b) - cosine similarity of two float vectors",
      two("cosine_sim", (a, b) =>
        Divide(DotFloat(a, b), Multiply(Sqrt(DotFloat(a, a)), Sqrt(DotFloat(b, b))))) _),
    ("ln_libm", "_FUNC_(x) - natural log via platform libm (bitwise == DuckDB ln; " +
      "Spark's built-in log is StrictMath, 1 ulp off)",
      (args: Seq[Expression]) => {
        require(args.length == 1, s"ln_libm expects 1 argument, got ${args.length}")
        LnDouble(org.apache.spark.sql.catalyst.expressions.Cast(args(0),
          org.apache.spark.sql.types.DoubleType))
      }),
    ("word_shingles", "_FUNC_(text, n) - distinct lowercase word n-gram shingles",
      (args: Seq[Expression]) => {
        require(args.length == 2, s"word_shingles expects 2 arguments, got ${args.length}")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles: n must be an integer literal, got $other")
        }
        WordShingles(args(0), n)
      }),
    ("sign_pack", "_FUNC_(v) - 1-bit binary-quantization code of a float vector " +
      "(sign bits packed into 32-bit words, array<bigint>)",
      (args: Seq[Expression]) => {
        require(args.length == 1, s"sign_pack expects 1 argument, got ${args.length}")
        SignPackFloat(args(0), graft.operators.Bq.WordBits)
      }),
    ("hamming_dist", "_FUNC_(a, b) - Hamming distance of two packed bigint codes",
      two("hamming_dist", HammingLongs(_, _)) _),
    ("lang_id", "_FUNC_(text) - marker-word language id (en/es/de/fr/zh/unknown)",
      viaColumn("lang_id", 1)(a => graft.functions.TextFunctions.langId(a(0))) _),
    ("quality_score", "_FUNC_(text) - Gopher-style [0,1] quality score",
      viaColumn("quality_score", 1)(a =>
        graft.functions.TextFunctions.qualityScore(a(0))) _),
    ("token_count", "_FUNC_(text) - whitespace token count",
      viaColumn("token_count", 1)(a =>
        graft.functions.TextFunctions.tokenCount(a(0))) _),
    ("subword_count", "_FUNC_(text) - BPE-ish regex subword count",
      viaColumn("subword_count", 1)(a =>
        graft.functions.TextFunctions.subwordCount(a(0))) _),
    ("simhash64", "_FUNC_(text) - 64-bit md5 SimHash fingerprint (hex string)",
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash64 expects 1 argument, got ${args.length}")
        // custom kernels take Expression children directly — routing the
        // word-set composite through the Column bridge would hand the
        // kernel an unresolved ColumnNode whose dataType is void
        import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Lower, StringSplit}
        graft.expressions.SimhashMd5(ArrayDistinct(
          StringSplit(Lower(args(0)), Literal("\\s+"), Literal(-1))))
      }),
    ("doc_fingerprint", "_FUNC_(text, shingle) - min-shingle md5 document fingerprint",
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"doc_fingerprint expects 2 arguments, got ${args.length}")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"doc_fingerprint: shingle must be an integer literal, got $other")
        }
        ColumnBridge.resolvedExpression(graft.functions.TextFunctions.fingerprint(
          ColumnBridge.column(args(0)), n))
      }),
    ("blocklist_hits", "_FUNC_(text, p1[, p2, ...]) - distinct blocklist " +
      "patterns occurring in text as substrings, in argument order; " +
      "size(_FUNC_(...)) > 0 is the C4 bad-word page gate. ONE " +
      "Aho-Corasick pass per row regardless of pattern count (the " +
      "automaton builds once at plan time), where contains() OR chains " +
      "rescan the text once per pattern.",
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          s"blocklist_hits expects text plus at least 1 pattern, got ${args.length}")
        val pats = args.tail.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String,
                       org.apache.spark.sql.types.StringType) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"blocklist_hits: patterns must be non-null string literals, got $other")
        }
        graft.expressions.MultiPatternMatches(args(0), pats)
      }))

  /** Lift a Column-level composite into a SQL function builder. */
  private def viaColumn(name: String, arity: Int)
                       (f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
                       (args: Seq[Expression]): Expression = {
    require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
    ColumnBridge.resolvedExpression(f(args.map(ColumnBridge.column)))
  }

  /** Register every kernel function on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      ColumnBridge.registerTempFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` hook (session-build-time registration):
  * scalar kernels plus the pipeline table functions
  * ([[GraftTableFunctions]] — `SELECT * FROM minhash_pairs(...)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
    GraftTableFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
    // planner rule for the deferred-execution leaf near_dedup composes
    ext.injectPlannerStrategy(_ => graft.plans.DeferredRelationStrategy)
  }
}
