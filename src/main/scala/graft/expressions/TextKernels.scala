package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shingling helper invoked from generated code (one static call per row
  * instead of an interpreted HOF expression tree per shingle — benched
  * ~10× on the dedup operators). */
object ShingleUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct lowercase word n-gram shingles, space-joined. Semantics
    * exactly match the declarative form
    * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
    *   i => concat_ws(" ", slice(split(lower(text), "\\s+"), i, n))))`
    * and the DuckDB oracle's list_transform mirror: fewer than n tokens
    * yield one shingle of all tokens. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = ws.split(text.toLowerCase.toString, -1)
    val count = math.max(tokens.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, tokens.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Character-n-gram helper invoked from generated code: all char start
  * offsets computed in one pass, each gram sliced by byte range — one
  * static call per row instead of an interpreted
  * sequence/transform/substr HOF tree per position (which additionally
  * re-evaluates any captured outer expression per element). */
object CharGramUtil {
  /** Distinct character n-grams of an ALREADY-LOWERCASED string.
    * Semantics exactly match the declarative form
    * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
    *   i => t.substr(i, n)))` and the DuckDB oracle's
    * `list_transform(generate_series(...), i -> substr(t, i, n))`
    * mirror: positions are characters (not bytes), a text shorter than
    * n yields itself as its single gram, and the empty string yields
    * [""]. The caller lowercases via Spark's own `lower` so engine
    * agreement is Spark's, not java.lang.String's. */
  def grams(lowered: UTF8String, n: Int): ArrayData = {
    val bytes = lowered.getBytes
    val nBytes = bytes.length
    // char start byte-offsets (UTF-8: starts are bytes not matching 10xxxxxx)
    var chars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = nBytes
    val count = math.max(chars - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var p = 0
    while (p < count) {
      val endChar = math.min(p + n, chars)
      seen.add(UTF8String.fromBytes(bytes, starts(p), starts(endChar) - starts(p)))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint helper (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003) invoked from generated code. Guarantee: two documents sharing
  * any substring of at least `window + gramLen − 1` characters select
  * at least one identical fingerprint — which is what makes a
  * fingerprint-bucket join a SOUND candidate generator for
  * substring-level (repeated-passage) dedup. */
object WinnowUtil {
  private val HexChars = "0123456789abcdef".getBytes
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct window-min md5 fingerprints of the char `gramLen`-grams
    * of an ALREADY-LOWERCASED string. Semantics (mirrored by the
    * DuckDB oracle): texts shorter than gramLen yield no fingerprints;
    * otherwise hashes h_i = md5(substr(t, i, gramLen)) for
    * i = 1..len−gramLen+1, and each of the max(count−window+1, 1)
    * sliding windows of `window` consecutive hashes selects its
    * minimum (lexicographic on the hex string — ties collapse to the
    * same value, so min-by-VALUE needs no index tie-break); output is
    * the distinct selected set. Sliding min runs via a monotonic deque
    * (O(count)); the md5s are computed once per position. */
  def fingerprints(lowered: UTF8String, gramLen: Int, window: Int): ArrayData = {
    val bytes = lowered.getBytes
    val nBytes = bytes.length
    var chars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < gramLen) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = nBytes
    val count = chars - gramLen + 1
    val md = mdLocal.get()
    // hex md5 per gram position
    val hashes = new Array[Array[Byte]](count)
    var p = 0
    while (p < count) {
      md.reset()
      md.update(bytes, starts(p), starts(p + gramLen) - starts(p))
      val digest = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((digest(b) >> 4) & 0xF)
        hex(2 * b + 1) = HexChars(digest(b) & 0xF)
        b += 1
      }
      hashes(p) = hex
      p += 1
    }
    def less(a: Array[Byte], b: Array[Byte]): Boolean = {
      var j = 0
      while (j < 32) {
        if (a(j) != b(j)) return a(j) < b(j)
        j += 1
      }
      false
    }
    val nWin = math.max(count - window + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](nWin * 2)
    // monotonic deque of positions, hashes ascending front-to-back
    val deque = new Array[Int](count)
    var head = 0
    var tail = 0 // exclusive
    p = 0
    while (p < count) {
      while (tail > head && !less(hashes(deque(tail - 1)), hashes(p))) tail -= 1
      deque(tail) = p; tail += 1
      val winStart = p - window + 1
      while (deque(head) < winStart) head += 1
      // a window completes at p >= window-1; the single degenerate
      // window of a short doc completes at the last position
      if (p >= window - 1 || p == count - 1)
        seen.add(UTF8String.fromBytes(hashes(deque(head))))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Unicode normalization helper invoked from generated code. The
  * already-normalized fast path (the overwhelming case — ASCII and
  * precomposed web text) returns the input UTF8String without
  * allocating; only texts that actually change pay the String
  * round-trip. JDK `java.text.Normalizer` implements the Unicode
  * standard algorithm, the same normative tables utf8proc/ICU follow —
  * which is what lets a DuckDB `nfc_normalize` oracle check the engine
  * byte-for-byte. */
object NormalizeUtil {
  def normalize(text: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }
}

/** text → Unicode-normalized text (NFC/NFD/NFKC/NFKD). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form $form")
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    NormalizeUtil.normalize(v.asInstanceOf[UTF8String],
      java.text.Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.expressions.NormalizeUtil.normalize($t,
         |  java.text.Normalizer.Form.$form);""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "unicode_normalize"
}

/** Character-level Shannon entropy helper (see [[CharEntropy]]).
  *
  * Determinism contract (what lets a DuckDB oracle replay the double
  * bit-for-bit): counts are per UNICODE CODE POINT (surrogate pairs are
  * one symbol — the same unit DuckDB's `string_split(text, '')`
  * produces), the Σ c·ln(c) fold runs in ASCENDING code-point order
  * (TreeMap iteration here ≡ SQL `ORDER BY ch` under binary collation,
  * since UTF-8 byte order is code-point order), starts from 0.0, and
  * every term is a pure function of an exact integer count — so the
  * whole chain is a fixed IEEE sequence both engines execute
  * identically (ln is the platform libm both engines call, the
  * `sample_weighted` precedent). */
object EntropyUtil {
  /** H(text) in nats: ln(n) − (Σ_chars c·ln(c))/n over code-point
    * counts c; 0.0 for empty text (callers filter, but never NaN). */
  def charEntropyNats(text: UTF8String): Double = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * Math.log(c)
    }
    Math.log(n.toDouble) - acc / n.toDouble
  }
}

/** text → character-level Shannon entropy in nats — the
  * gibberish / keyboard-mash / binary-spill quality signal (near-zero
  * for `aaaa…`, ≈ log|alphabet| for uniform noise; real prose sits in
  * a narrow band between). One linear pass per row riding the scan —
  * no explode, no shuffle: the (doc, char) histogram a SQL formulation
  * would shuffle ~n_chars rows for stays in a per-row TreeMap. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    EntropyUtil.charEntropyNats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.EntropyUtil.charEntropyNats($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_entropy"
}

/** lowered text → array<string> of distinct winnowing fingerprints. */
case class WinnowFingerprints(child: Expression, gramLen: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowUtil.fingerprints(v.asInstanceOf[UTF8String], gramLen, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.WinnowUtil.fingerprints($t, $gramLen, $window);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

/** lowered text → array<string> of distinct character n-grams. */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CharGramUtil.grams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.CharGramUtil.grams($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_grams"
}

/** text → array<string> of distinct lowercase word n-gram shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.ShingleUtil.shingles($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Positional gram-hash helper invoked from generated code — the
  * ExactSubstr char-gram stream ([[graft.operators.Curation]]
  * `exactSpanDedupChars`): h_i = md5(substr(t, i, gramLen)) for every
  * start i, computed in ONE linear pass over the UTF-8 bytes (the
  * [[WinnowUtil]] byte-offset index — each gram's bytes are digested
  * straight from the backing array, never via a char-indexed substring,
  * whose interpreted HOF form costs an O(i) scan PER POSITION and turns
  * multi-kB documents O(chars²)). The hash is the RAW 16-byte digest —
  * the hex form is a bijection of it, so every grouping/join keyed on
  * it is unchanged while the gram shuffle (the operator's dominant
  * cost: one keyed row PER CHARACTER of the corpus) carries half the
  * key bytes; ≡ unhex(md5(substr(...))) for the oracle's replay. */
object GramHashUtil {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Word-gram variant for `exactSpanDedup`: h_i =
    * md5(concat_ws(" ", slice(words, i, gramLen))) for every start i,
    * the md5 fed token bytes + 0x20 separators incrementally (never a
    * per-gram joined string); token bytes are materialized once per row
    * and reused across the gramLen grams that contain them. Empty when
    * fewer than `gramLen` words. Output shape is [[gramHashes]]'s. */
  def wordGramHashes(words: ArrayData, gramLen: Int): ArrayData = {
    val n = words.numElements()
    if (n < gramLen) return new GenericArrayData(Array.empty[Any])
    val tok = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tok(i) = words.getUTF8String(i).getBytes
      i += 1
    }
    val count = n - gramLen + 1
    val md = mdLocal.get()
    val out = new Array[Any](count)
    var p = 0
    while (p < count) {
      md.reset()
      var j = 0
      while (j < gramLen) {
        if (j > 0) md.update(' '.toByte)
        md.update(tok(p + j))
        j += 1
      }
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.update(0, p + 1)
      row.update(1, md.digest())
      out(p) = row
      p += 1
    }
    new GenericArrayData(out)
  }

  /** array<struct<start:int (1-based char index), h:binary (16-byte
    * md5)>> — one row per gram start; empty when the text is shorter
    * than `gramLen` characters. */
  def gramHashes(text: UTF8String, gramLen: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var chars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < gramLen) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = nBytes
    val count = chars - gramLen + 1
    val md = mdLocal.get()
    val out = new Array[Any](count)
    var p = 0
    while (p < count) {
      md.reset()
      md.update(bytes, starts(p), starts(p + gramLen) - starts(p))
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.update(0, p + 1)
      row.update(1, md.digest())
      out(p) = row
      p += 1
    }
    new GenericArrayData(out)
  }
}

private[expressions] object GramStartsType {
  val dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.BinaryType, nullable = false))),
    containsNull = false)
}

/** text → array<struct<start,h>> of positional char-gram raw-md5 hashes. */
case class GramMd5Starts(child: Expression, gramLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = GramStartsType.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GramHashUtil.gramHashes(v.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.GramHashUtil.gramHashes($t, $gramLen);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "gram_md5_starts"
}

/** array<string> of words → array<struct<start,h>> of positional
  * word-gram raw-md5 hashes (≡ unhex(md5(concat_ws(" ", slice(w, i,
  * l))))). */
case class WordGramMd5Starts(child: Expression, gramLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = GramStartsType.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GramHashUtil.wordGramHashes(v.asInstanceOf[ArrayData], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.GramHashUtil.wordGramHashes($t, $gramLen);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_gram_md5_starts"
}

/** SimHash helper invoked from generated code: one md5 + tight bit loop
  * per token, one static call per row. Bit semantics identical to the
  * declarative md5-nibble form (and the DuckDB oracle): bit i of a token
  * is bit (i mod 4) of hex nibble (i div 4) of md5(token); output is the
  * 16-hex-char fingerprint of the sign-summed counts. */
object SimhashUtil {
  private val HexChars = "0123456789abcdef".getBytes
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhashHex(tokens: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val md = mdLocal.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) { // null tokens contribute nothing
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 64) {
          // hex char j = i/4: even j → high nibble of byte j/2, odd → low
          val j = i >> 2
          val nib = if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xF
                    else digest(j >> 1) & 0xF
          counts(i) += (if (((nib >> (i & 3)) & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      var nib = 0
      var b = 0
      while (b < 4) { if (counts(4 * j + b) > 0) nib |= 1 << b; b += 1 }
      out(j) = HexChars(nib)
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

object SimhashXxUtil {
  /** 64-bit xxhash64-based simhash (bit i = bit i of Spark's xxhash64,
    * seed 42) — bit-identical to the declarative
    * `shiftright(xxhash64(t), i) & 1` sign-sum form it replaces. */
  def simhashXx(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) { // null tokens contribute nothing
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tok, StringType, 42L)
        var i = 0
        while (i < 64) {
          counts(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= 1L << i; i += 1 }
    out
  }
}

/** array<string> of tokens → 64-bit xxhash64 simhash. */
case class SimhashXx(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimhashXxUtil.simhashXx(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.SimhashXxUtil.simhashXx($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash_xx"
}

/** array<string> of tokens → 16-hex-char md5 simhash fingerprint. */
case class SimhashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimhashUtil.simhashHex(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.SimhashUtil.simhashHex($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash_md5"
}

/** Count-embedding helper invoked from generated code: ONE static call
  * per row folds the whole token array into a dim-length signed-count
  * vector — the feature-hashing embedder computed inside the scan, with
  * zero exchange (it replaces an explode + typed-Aggregator shuffle;
  * the exchange was `pipeline_rag`'s 10M variance source). Signed
  * counts are exact small integers, so the sequential per-row fold is
  * bit-identical to any aggregation order, and the md5 variant replays
  * in SQL as the same per-token bucket/sign arithmetic
  * ([[graft.functions.HashingEmbedder.md5BucketSign]]). */
object CountEmbedUtil {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SignPrefix = UTF8String.fromString("sign|")

  private def finish(counts: Array[Double], normalize: Boolean): ArrayData = {
    val dim = counts.length
    val out = new Array[Any](dim)
    var i = 0
    if (!normalize) {
      // raw signed counts — exact small integers, float-exact
      while (i < dim) { out(i) = counts(i).toFloat; i += 1 }
      return new GenericArrayData(out)
    }
    var s = 0.0
    while (i < dim) { s += counts(i) * counts(i); i += 1 }
    val n = if (s == 0.0) 1.0 else math.sqrt(s)
    i = 0
    while (i < dim) { out(i) = (counts(i) / n).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  /** md5 variant: bucket = (unsigned int of digest bytes 0–3) mod dim
    * (≡ conv(substring(md5, 1, 8), 16, 10) % dim), sign = parity of the
    * 9th hex nibble (high nibble of digest byte 4). Empty/null tokens
    * contribute nothing (the old explode path filtered them). */
  def embedMd5(tokens: ArrayData, dim: Int, normalize: Boolean): ArrayData = {
    val counts = new Array[Double](dim)
    val md = mdLocal.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null && tok.numBytes() > 0) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        val v = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
          ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
        val bucket = (v % dim).toInt
        val sign = if ((((digest(4) >> 4) & 0xF) % 2) == 0) 1.0 else -1.0
        counts(bucket) += sign
      }
      t += 1
    }
    finish(counts, normalize)
  }

  /** xxhash64 variant (Spark's seed-42 hash, the [[SimhashXxUtil]]
    * discipline): bucket = pmod(xxhash64(tok), dim), sign from
    * pmod(xxhash64("sign|" ∥ tok), 2) — bit-identical to the
    * declarative pmod/when form it replaces. */
  def embedXx(tokens: ArrayData, dim: Int, normalize: Boolean): ArrayData = {
    val counts = new Array[Double](dim)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null && tok.numBytes() > 0) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tok, StringType, 42L)
        val bucket = (((h % dim) + dim) % dim).toInt
        val hs = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.concat(SignPrefix, tok), StringType, 42L)
        val sign = if ((((hs % 2) + 2) % 2) == 0L) 1.0 else -1.0
        counts(bucket) += sign
      }
      t += 1
    }
    finish(counts, normalize)
  }
}

/** array<string> of tokens → dim-length float count-embedding computed
  * per row inside the scan (md5 bucket/sign; `normalize` = L2). */
case class Md5CountEmbed(child: Expression, dim: Int, normalize: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CountEmbedUtil.embedMd5(v.asInstanceOf[ArrayData], dim, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.CountEmbedUtil.embedMd5($t, $dim, $normalize);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "md5_count_embed"
}

/** array<string> of tokens → dim-length float count-embedding (Spark
  * xxhash64 bucket/sign; `normalize` = L2). */
case class XxCountEmbed(child: Expression, dim: Int, normalize: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CountEmbedUtil.embedXx(v.asInstanceOf[ArrayData], dim, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.CountEmbedUtil.embedXx($t, $dim, $normalize);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "xx_count_embed"
}

/** Aho-Corasick multi-pattern matcher invoked from generated code —
  * the C4-style blocklist gate (Raffel et al. 2020 §2.2 drop any page
  * containing a listed word/phrase; lists run to thousands of entries).
  * ONE automaton pass per row, O(n_chars + matches), where the naive
  * plan is |patterns| separate contains() scans — the automaton is
  * built once on the driver and ships to executors through the plan's
  * reference array, so per-row work is independent of list size. */
object MultiPatternUtil {

  /** Immutable matching automaton. Matching is over UTF-16 code units
    * (Java String semantics — identical to substring `contains`, and
    * byte-equal to DuckDB's `contains` on any valid UTF-8 input because
    * a UTF-8 substring match and a UTF-16 substring match agree on
    * well-formed text). Patterns must be non-empty. */
  final class Automaton(patternStrings: Array[String]) extends Serializable {
    require(patternStrings.nonEmpty, "pattern list must be non-empty")
    require(patternStrings.forall(_.nonEmpty), "patterns must be non-empty")
    require(patternStrings.distinct.length == patternStrings.length,
      "patterns must be distinct")

    private val numPatterns = patternStrings.length
    // goto trie over chars; HashMap transitions (the alphabet is all of
    // UTF-16, so dense rows are not an option), fail links, and per-node
    // pattern-id output lists with fail-closure merged in at build time.
    // Builder buffers are @transient: the automaton ships to executors
    // through the plan's reference array, and only the final arrays
    // below are read after construction — serializing the buffers would
    // double the shipped size of a production-scale list
    @transient private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
    @transient private val failBuf = scala.collection.mutable.ArrayBuffer(0)
    @transient private val outBuf = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)

    patternStrings.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val next = gotoMaps(node).get(c)
        node = if (next != null) next.intValue()
          else {
            gotoMaps += new java.util.HashMap[Character, Integer]()
            failBuf += 0
            outBuf += Array.empty
            val id = gotoMaps.length - 1
            gotoMaps(node).put(c, Integer.valueOf(id))
            id
          }
        i += 1
      }
      outBuf(node) = outBuf(node) :+ pid
    }
    // BFS fail links; out(v) ++= out(fail(v)) so a hit at v reports every
    // pattern ending at v OR at any proper suffix of the current path
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMaps(0).forEach { (_, v) => failBuf(v) = 0; queue.add(v); () }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        gotoMaps(u).forEach { (c, v) =>
          var f = failBuf(u)
          while (f != 0 && !gotoMaps(f).containsKey(c)) f = failBuf(f)
          val fv = gotoMaps(f).get(c)
          val target = if (fv != null && fv.intValue() != v.intValue())
            fv.intValue() else 0
          failBuf(v) = target
          if (outBuf(target).nonEmpty)
            outBuf(v) = outBuf(v) ++ outBuf(target)
          queue.add(v)
          ()
        }
      }
    }
    private val gotoArr: Array[java.util.HashMap[Character, Integer]] = gotoMaps.toArray
    private val fail: Array[Int] = failBuf.toArray
    private val out: Array[Array[Int]] = outBuf.toArray
    // result strings pre-encoded once; matchesDistinct returns these by
    // reference (UTF8String is immutable)
    private val patternUtf8: Array[UTF8String] =
      patternStrings.map(UTF8String.fromString)

    /** Distinct matched patterns, in pattern-list order (= DuckDB
      * `list_filter(patterns, p -> contains(text, p))` order). */
    def matchesDistinct(text: UTF8String): GenericArrayData = {
      val s = text.toString
      val seen = new Array[Boolean](numPatterns)
      var remaining = numPatterns
      var node = 0
      var i = 0
      while (i < s.length && remaining > 0) {
        val c = Character.valueOf(s.charAt(i))
        var next = gotoArr(node).get(c)
        while (next == null && node != 0) {
          node = fail(node)
          next = gotoArr(node).get(c)
        }
        if (next != null) node = next.intValue()
        val hits = out(node)
        var h = 0
        while (h < hits.length) {
          if (!seen(hits(h))) { seen(hits(h)) = true; remaining -= 1 }
          h += 1
        }
        i += 1
      }
      val res = new Array[AnyRef](numPatterns - remaining)
      var p = 0
      var w = 0
      while (p < numPatterns) {
        if (seen(p)) { res(w) = patternUtf8(p); w += 1 }
        p += 1
      }
      new GenericArrayData(res)
    }
  }
}

/** text → array<string> of the DISTINCT blocklist patterns occurring in
  * it as substrings, in pattern-list order — `size(...) > 0` is the C4
  * bad-word page gate, `size(...)` the per-doc hit count. Exact
  * substring semantics (compose word boundaries by normalizing text and
  * padding patterns with the boundary char). One Aho-Corasick pass per
  * row riding the scan — no shuffle, per-row cost independent of
  * |patterns| where a contains() chain pays |patterns| rescans.
  *
  * Duplicate patterns in the input list collapse (first occurrence
  * wins), so oracle parity is against a DISTINCT pattern list: pair
  * this with `list_filter(list_distinct(patterns), ...)` — a literal
  * list_filter over a duplicate-bearing list would count a repeated
  * pattern once per occurrence where this expression reports it once. */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  // duplicate patterns collapse (first occurrence wins): a SQL user
  // passing the same literal twice gets gate semantics, not the
  // Automaton's duplicate-rejection crash
  @transient private lazy val ac =
    new MultiPatternUtil.Automaton(patterns.distinct.toArray)

  override def nullSafeEval(v: Any): Any =
    ac.matchesDistinct(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac,
      classOf[MultiPatternUtil.Automaton].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $acRef.matchesDistinct($t);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "multi_pattern_matches"
}

object TextKernels {
  /** Distinct lowercase word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Distinct character n-grams of an already-lowercased text column. */
  def charGrams(lowered: Column, n: Int): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(lowered), n))

  /** Distinct winnowing fingerprints of an already-lowercased text
    * column (md5 window-mins over char gramLen-grams). */
  def winnowFingerprints(lowered: Column, gramLen: Int, window: Int): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(lowered), gramLen, window))

  /** Positional char-gram md5 hashes (start, h) of a text column —
    * the linear-time ExactSubstr gram stream. */
  def gramMd5Starts(text: Column, gramLen: Int): Column =
    ColumnBridge.column(
      GramMd5Starts(ColumnBridge.expression(text), gramLen))

  /** Positional word-gram md5 hashes (start, h) of a word-array
    * column — the ExactSubstr word-gram stream. */
  def wordGramMd5Starts(words: Column, gramLen: Int): Column =
    ColumnBridge.column(
      WordGramMd5Starts(ColumnBridge.expression(words), gramLen))

  /** md5-bit simhash hex fingerprint of a token-array column. */
  def simhashMd5(tokens: Column): Column =
    ColumnBridge.column(SimhashMd5(ColumnBridge.expression(tokens)))

  /** Per-row md5 count-embedding of a token-array column. */
  def md5CountEmbed(tokens: Column, dim: Int, normalize: Boolean): Column =
    ColumnBridge.column(
      Md5CountEmbed(ColumnBridge.expression(tokens), dim, normalize))

  /** Per-row xxhash64 count-embedding of a token-array column. */
  def xxCountEmbed(tokens: Column, dim: Int, normalize: Boolean): Column =
    ColumnBridge.column(
      XxCountEmbed(ColumnBridge.expression(tokens), dim, normalize))

  /** Unicode-normalize a text column (form ∈ NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(text: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))

  /** Character-level Shannon entropy (nats) of a text column. */
  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  /** 64-bit xxhash64 simhash of a token-array column. */
  def simhashXx(tokens: Column): Column =
    ColumnBridge.column(SimhashXx(ColumnBridge.expression(tokens)))

  /** Distinct blocklist patterns occurring in a text column as
    * substrings (pattern-list order) — one Aho-Corasick pass per row. */
  def multiPatternMatches(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiPatternMatches(ColumnBridge.expression(text), patterns))

  /** md5 gram-bucket ids (unigrams then bigrams) of a token-array
    * column — the [[graft.operators.Classifier.gramBuckets]] hot path
    * as one static call per row. */
  def gramBucketsMd5(tokens: Column, dim: Int): Column =
    ColumnBridge.column(GramBucketsMd5(ColumnBridge.expression(tokens), dim))

  /** Per-doc (bucket, count) pairs over the md5 gram buckets, bias
    * entry (dim, 1.0) appended — Classifier.train's whole feature
    * build for one doc in one call (replaces explode + groupBy). */
  def gramBucketCountsMd5(tokens: Column, dim: Int): Column =
    ColumnBridge.column(
      GramBucketCountsMd5(ColumnBridge.expression(tokens), dim))

  /** bias + Σ weights(bucket) over the md5 gram buckets in gram order —
    * the hashedLinearLogit scoring fold as one static call per row. */
  def hashedLogitMd5(tokens: Column, dim: Int, weights: Seq[Double],
                     bias: Double): Column =
    ColumnBridge.column(
      HashedLogitMd5(ColumnBridge.expression(tokens), dim, weights, bias))
}

/** md5 gram-bucket helpers invoked from generated code: ONE static call
  * per row replaces the interpreted HOF chain (filter → transform
  * bigrams → transform/aggregate with per-gram
  * `conv(substring(md5(g),1,8),16,10)`) the classifier/DSIR family
  * previously paid — higher-order functions are CodegenFallback, so
  * every gram paid interpreted dispatch plus a 32-hex-char string
  * round-trip per hash. Semantics are EXACTLY the declarative form's
  * (and the DuckDB oracle's replay): tokens are the raw
  * `split(lower(text), "\\s+")` output, empty tokens are dropped, grams
  * are the surviving unigrams left→right then the adjacent bigrams
  * (tok_i ∥ " " ∥ tok_{i+1}) left→right, and
  * bucket = (unsigned int of md5 digest bytes 0–3) mod dim
  * (≡ conv(substring(md5(gram), 1, 8), 16, 10) % dim — the
  * [[CountEmbedUtil.embedMd5]] identity). */
object GramBucketUtil {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = UTF8String.fromString(" ")

  private def bucket(md: java.security.MessageDigest, s: UTF8String,
                     dim: Int): Int = {
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    (v % dim).toInt
  }

  /** Non-empty tokens in order ("\\s+" split only yields empties at the
    * ends, so dropping them never changes bigram adjacency — identical
    * to the `filter(toks, w => w =!= "")` the declarative form used). */
  private def nonEmpty(tokens: ArrayData): Array[UTF8String] = {
    val n = tokens.numElements()
    val buf = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) { buf(m) = t; m += 1 }
      i += 1
    }
    if (m == n) buf else java.util.Arrays.copyOf(buf, m)
  }

  def gramBuckets(tokens: ArrayData, dim: Int): ArrayData = {
    val toks = nonEmpty(tokens)
    val md = mdLocal.get()
    val nUni = toks.length
    val nBi = math.max(0, nUni - 1)
    val out = new Array[Any](nUni + nBi)
    var i = 0
    while (i < nUni) { out(i) = bucket(md, toks(i), dim); i += 1 }
    i = 0
    while (i < nBi) {
      out(nUni + i) =
        bucket(md, UTF8String.concat(toks(i), Space, toks(i + 1)), dim)
      i += 1
    }
    new GenericArrayData(out)
  }

  def bucketCounts(tokens: ArrayData, dim: Int): ArrayData = {
    val toks = nonEmpty(tokens)
    val md = mdLocal.get()
    val cnt = new Array[Int](dim)
    val order = new Array[Int](math.min(dim, 2 * math.max(1, toks.length)))
    var nOrder = 0
    def add(b: Int): Unit = {
      if (cnt(b) == 0) { order(nOrder) = b; nOrder += 1 }
      cnt(b) += 1
    }
    var i = 0
    while (i < toks.length) { add(bucket(md, toks(i), dim)); i += 1 }
    i = 0
    while (i + 1 < toks.length) {
      add(bucket(md, UTF8String.concat(toks(i), Space, toks(i + 1)), dim))
      i += 1
    }
    val out = new Array[Any](nOrder + 1)
    i = 0
    while (i < nOrder) {
      val b = order(i)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, cnt(b).toDouble))
      i += 1
    }
    // the constant bias feature at bucket `dim`: every doc (even a
    // gram-less one) carries exactly one (dim, 1.0) row
    out(nOrder) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dim, 1.0))
    new GenericArrayData(out)
  }

  def hashedLogit(tokens: ArrayData, weights: Array[Double], bias: Double,
                  dim: Int): Double = {
    val toks = nonEmpty(tokens)
    val md = mdLocal.get()
    // left fold in gram order (unigrams then bigrams), bias added last —
    // the exact IEEE addition order of
    // `lit(bias) + aggregate(grams, 0.0, acc + w(bucket))`
    var acc = 0.0
    var i = 0
    while (i < toks.length) { acc += weights(bucket(md, toks(i), dim)); i += 1 }
    i = 0
    while (i + 1 < toks.length) {
      acc += weights(bucket(md, UTF8String.concat(toks(i), Space, toks(i + 1)), dim))
      i += 1
    }
    bias + acc
  }
}

/** array<string> of raw split tokens → array<int> of md5 gram buckets
  * (unigrams then bigrams over the non-empty tokens). */
case class GramBucketsMd5(child: Expression, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GramBucketUtil.gramBuckets(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.GramBucketUtil.gramBuckets($t, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "gram_buckets_md5"
}

/** array<string> of raw split tokens → array<struct<b:int,c:double>> of
  * per-doc (bucket, count) pairs, bias entry (dim, 1.0) last. */
case class GramBucketCountsMd5(child: Expression, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("c", DoubleType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GramBucketUtil.bucketCounts(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.GramBucketUtil.bucketCounts($t, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "gram_bucket_counts_md5"
}

/** array<string> of raw split tokens → double logit
  * (bias + Σ weights(bucket) in gram order). */
case class HashedLogitMd5(child: Expression, dim: Int,
                          weights: Seq[Double], bias: Double)
    extends UnaryExpression {
  require(weights.length == dim, s"need $dim weights, got ${weights.length}")
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def nullSafeEval(v: Any): Any =
    GramBucketUtil.hashedLogit(v.asInstanceOf[ArrayData], wArr, bias, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "double[]")
    // bias ships as a reference object: interpolating a double literal
    // into Java source would mis-render NaN/Infinity
    val bRef = ctx.addReferenceObj("bias", java.lang.Double.valueOf(bias),
      "java.lang.Double")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.GramBucketUtil.hashedLogit(" +
        s"$t, $wRef, $bRef.doubleValue(), $dim);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hashed_logit_md5"
}
