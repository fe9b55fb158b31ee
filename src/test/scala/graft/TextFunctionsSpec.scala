package graft

import graft.functions.{HashingEmbedder, TextFunctions}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox is one of the animals"),
      (1L, "der hund ist nicht ein der die das"),
      (2L, "el perro es un animal que la de y"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
  }

  test("token counting: whitespace and subword") {
    val r = df.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(0L) == 9L && r(3L) == 2L)
    val sub = df.filter(col("doc_id") === 3)
      .select(TextFunctions.subwordCount(lit("don't stop, won't stop!"))).head.getLong(0)
    assert(sub >= 8) // words + punctuation pieces
  }

  test("langId picks the language with most marker hits; und when none") {
    val r = df.select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "es")
    assert(r(3L) == "und")
  }

  test("quality score is in [0,1], higher for natural text than garbage") {
    val s = spark
    import s.implicits._
    val q = Seq(
      (0L, "the cat sat on the mat and the dog is in the house of a friend"),
      (1L, "!!! ### $$$ %%% ^^^ &&& *** ((( )))"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0L) > q(1L))
  }

  test("fingerprint: deterministic, case-insensitive, content-sensitive") {
    val s = spark
    import s.implicits._
    val fp = Seq((0L, "Hello World Document"), (1L, "hello world document"),
      (2L, "another document entirely"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("hashing embedder: deterministic, normalized, dim-correct") {
    val e = HashingEmbedder.embed(df, "doc_id", "text", dim = 32)
    val vecs = e.select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.values.forall(_.length == 32))
    val n0 = math.sqrt(vecs(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-5)
    // determinism: re-run gives identical vectors
    val again = HashingEmbedder.embed(df, "doc_id", "text", dim = 32)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs == again)
    // same text in two rows ⇒ same embedding
    val t = HashingEmbedder.embedText(spark, "the quick brown fox is one of the animals", 32)
    assert(t.toSeq == vecs(0L))
    // token-less text keeps its row with a zero vector (no silent drop)
    val z = HashingEmbedder.embedText(spark, "", 32)
    assert(z.length == 32 && z.forall(_ == 0.0f))
  }

  test("md5-count embedder: distributed path equals the driver-side twin") {
    val texts = Seq((0L, "the quick brown fox is one of the animals"),
      (1L, "spark table scan fast query"), (2L, ""))
    val s = spark
    import s.implicits._
    val cdf = texts.toDF("doc_id", "text")
    val vecs = HashingEmbedder.embedMd5Counts(cdf, "doc_id", "text", dim = 32)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    texts.foreach { case (id, t) =>
      val local = HashingEmbedder.md5CountsLocal(t, 32).map(_.toFloat).toSeq
      assert(vecs(id) == local, s"doc $id distributed != local")
    }
    // counts are raw integers (unnormalized)
    assert(vecs(0L).forall(x => x == math.rint(x)))
  }

  test("production xxhash64 embed -> knnCosine composition: self-match first, " +
    "ranking equals driver-side brute force") {
    // the oracle-checked driver queries pin the md5-variant embedders;
    // this keeps the production xxhash64 embed+search path exercised
    val e = HashingEmbedder.embed(df, "doc_id", "text", dim = 32)
    val q = HashingEmbedder.embedText(spark, "the quick brown fox is one of the animals", 32)
    val got = graft.operators.Search.knnCosine(e, "doc_id", "embedding", q.toSeq, 4)
      .select("doc_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // doc 0 has the query's exact text: cosine distance ~0, ranked first
    assert(got.head._1 == 0L && got.head._2 < 1e-6, s"self-match not first: ${got.toSeq}")
    // full ranking equals brute-force cosine over the collected embeddings
    val vecs = e.select("doc_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      1.0 - dot / math.sqrt(na * nb)
    }
    val expect = vecs.map { case (id, v) => (id, cosDist(v, q)) }
      .sortBy { case (id, d) => (d, id) }.take(4).map(_._1).toSeq
    assert(got.map(_._1).toSeq == expect, s"ranking mismatch: got ${got.toSeq}")
  }

  test("hashing embedder groups by non-numeric ids without loss") {
    val s = spark
    import s.implicits._
    val df = Seq(("doc-a", "alpha beta"), ("doc-b", "alpha beta"), ("doc-c", "gamma"))
      .toDF("uid", "text")
    val vecs = HashingEmbedder.embed(df, "uid", "text", dim = 16)
      .select("uid", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.size == 3)
    assert(vecs("doc-a") == vecs("doc-b")) // same text, same vector
    assert(vecs("doc-a") != vecs("doc-c"))
  }

  test("hashedLinearLogit: gram order, bucket lookup, bias; empty doc scores bias") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions.hashedLinearLogit
    import graft.operators.Sketch
    val dim = 16
    val weights = (0 until dim).map(i => i * 0.25 - 1.0)
    val df = Seq((0L, "Alpha beta"), (1L, ""), (2L, "solo")).toDF("id", "text")
    val got = df.select(col("id"),
        hashedLinearLogit(col("text"), dim, weights, bias = 0.5).as("logit"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand fold: unigrams then the bigram, lowercased
    def bucket(g: String): Int = df.sparkSession.range(1)
      .select((Sketch.hash32(lit(g)) % dim).cast("int")).collect()(0).getInt(0)
    val expect0 = 0.5 + weights(bucket("alpha")) + weights(bucket("beta")) +
      weights(bucket("alpha beta"))
    assert(got(0L) == expect0)
    assert(got(1L) == 0.5)                       // no grams: logit = bias
    assert(got(2L) == 0.5 + weights(bucket("solo"))) // no bigram for 1 token
  }

  test("repetition signals: hand-computed fractions, degenerate docs score 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, "a b a b a b"),        // 6 tokens {a,b}: dup_word 4/6; 5 bigrams
                                  // {a b ×3, b a ×2}: top 3/5; 4 trigrams
                                  // {a b a ×2, b a b ×2}: dup 2/4
      (1L, "x y z w"),            // all distinct: dup fracs 0, top bigram 1/3
      (2L, "solo"),               // 1 token: no bigrams/trigrams → 0.0
      (3L, "p p p p"))            // dup_word 3/4, top bigram 3/3, dup_3gram 1/2
      .toDF("doc_id", "text")
    val sig = graft.functions.TextFunctions.repetitionSignals(col("text"))
    val r = df.select(col("doc_id"), sig("n_tokens").as("n"),
        sig("dup_word_frac").as("dw"), sig("dup_3gram_frac").as("d3"),
        sig("top_bigram_frac").as("tb")).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(0L) == ((6L, 4.0 / 6, 2.0 / 4, 3.0 / 5)))
    assert(r(1L) == ((4L, 0.0, 0.0, 1.0 / 3)))
    assert(r(2L) == ((1L, 0.0, 0.0, 0.0)))
    assert(r(3L) == ((4L, 3.0 / 4, 1.0 / 2, 1.0)))
  }

  test("unicodeNormalize: NFC composes, NFKC folds compat chars, NFD round-trips, edges") {
    val s = spark
    import s.implicits._
    import graft.expressions.TextKernels.unicodeNormalize
    import org.apache.spark.sql.functions.col
    val decomposed = "café"          // e + combining acute
    val composed = "café"             // precomposed é
    val df = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "ﬁle AＡ 2²"),    // ﬁ ligature, fullwidth Ａ, superscript ²
      (4L, "plain ascii"),
      (5L, "emoji 😀 stays"),    // non-BMP surrogate pair
      (6L, null.asInstanceOf[String]))
      .toDF("id", "t")
    def run(form: String) = df
      .select(col("id"), unicodeNormalize(col("t"), form).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val nfc = run("NFC")
    assert(nfc(1L).get == composed && nfc(2L).get == composed)
    assert(nfc(3L).get == "ﬁle AＡ 2²",
      "NFC must NOT fold compatibility characters")
    assert(nfc(4L).get == "plain ascii" && nfc(5L).get == "emoji 😀 stays")
    assert(nfc(6L).isEmpty, "null passes through")
    val nfkc = run("NFKC")
    assert(nfkc(3L).get == "file AA 22", "NFKC folds ﬁ/fullwidth/superscript")
    // NFD decomposes; NFC of the NFD form returns to the composed form
    val nfd = run("NFD")
    assert(nfd(2L).get == decomposed)
    val roundTrip = df.select(col("id"),
        unicodeNormalize(unicodeNormalize(col("t"), "NFD"), "NFC").as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(roundTrip(1L).get == composed && roundTrip(2L).get == composed)
    intercept[IllegalArgumentException] {
      graft.expressions.UnicodeNormalize(null, "NFX")
    }
  }

  test("charEntropy: degenerate/uniform/known values, code-point units, null") {
    val s = spark
    import s.implicits._
    import graft.expressions.TextKernels.charEntropy
    val df = Seq(
      (1L, "aaaaaaaa"),          // one symbol → H = 0 exactly
      (2L, "abababab"),          // two equiprobable → H = ln 2 exactly
      (3L, "abcd"),              // four distinct → H = ln 4
      (4L, ""),                  // empty → 0.0 (never NaN)
      (5L, "😀😀🎉🎉"),          // surrogate pairs: 4 code points, 2 symbols
      (6L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val h = df.select(col("id"), charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(h(1L).get == 0.0)
    // bit-exact against the kernel's own IEEE chain (≈ ln 2 within 1 ulp)
    val ab = 4.0 * Math.log(4.0)
    assert(h(2L).get == Math.log(8.0) - (0.0 + ab + ab) / 8.0)
    assert(math.abs(h(2L).get - Math.log(2.0)) < 1e-15)
    assert(math.abs(h(3L).get - Math.log(4.0)) < 1e-15)
    assert(h(4L).get == 0.0)
    // counted per CODE POINT: 4 symbols, 2 distinct, equiprobable → ln 2.
    // A UTF-16 code-unit counter would see 8 units and 4 distinct halves.
    val e2 = 2.0 * Math.log(2.0)
    assert(h(5L).get == Math.log(4.0) - (0.0 + e2 + e2) / 4.0)
    assert(math.abs(h(5L).get - Math.log(2.0)) < 1e-15)
    assert(h(6L).isEmpty, "null passes through")
    // prose sits strictly between the degenerate poles
    val prose = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t").select(charEntropy(col("t"))).head.getDouble(0)
    assert(prose > 2.0 && prose < Math.log(44.0))
  }

  test("blocklistMatches: nested/overlapping patterns, order, edges, null") {
    val s = spark
    import s.implicits._
    val pats = Seq("batch batch", "batch batch batch", "fast key",
      "key order", "zz end", "start zz")
    val df = Seq(
      (1L, "x batch batch batch y"),   // nested: both batch patterns
      (2L, "the fast key order sort"), // overlapping spans both report
      (3L, "no hits here"),
      (4L, "start zz mid zz end"),     // pattern at start AND end of text
      (5L, ""),                        // empty text → empty array
      (6L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val r = df.select(col("id"),
        TextFunctions.blocklistMatches(col("t"), pats).as("hits"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[String](1)))).toMap
    // distinct matches, reported in PATTERN-LIST order (the oracle's
    // list_filter order), fail-closure reports the nested shorter hit
    assert(r(1L).get == Seq("batch batch", "batch batch batch"))
    assert(r(2L).get == Seq("fast key", "key order"))
    assert(r(3L).get == Seq.empty)
    assert(r(4L).get == Seq("zz end", "start zz"))
    assert(r(5L).get == Seq.empty)
    assert(r(6L).isEmpty, "null passes through")
  }

  test("blocklistMatches agrees with a per-pattern contains() reference") {
    val s = spark
    import s.implicits._
    val pats = Seq("ab", "abc", "bca", "cab", "aaa", "bb c", "c a b")
    // pseudo-random 3-letter soup exercises dense overlap/fail paths
    val rng = new scala.util.Random(7)
    val docs = (0L until 200L).map { i =>
      (i, (0 until 30).map(_ => "abc ".charAt(rng.nextInt(4))).mkString)
    }.toDF("id", "t")
    val kernel = docs.select(col("id"),
        TextFunctions.blocklistMatches(col("t"), pats).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val naive = docs.collect().map { r =>
      r.getLong(0) -> pats.filter(r.getString(1).contains(_))
    }.toMap
    assert(kernel == naive)
    // the boolean gate is the size>0 composition
    val anyCount = docs.filter(TextFunctions.blocklistAny(col("t"), pats)).count()
    assert(anyCount == naive.values.count(_.nonEmpty))
  }

  test("blocklistMatches rejects degenerate pattern lists") {
    intercept[IllegalArgumentException] {
      new graft.expressions.MultiPatternUtil.Automaton(Array.empty[String])
    }
    intercept[IllegalArgumentException] {
      new graft.expressions.MultiPatternUtil.Automaton(Array("ok", ""))
    }
    intercept[IllegalArgumentException] {
      new graft.expressions.MultiPatternUtil.Automaton(Array("dup", "dup"))
    }
  }
}
