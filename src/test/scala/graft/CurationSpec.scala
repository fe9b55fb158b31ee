package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Gopher quality rules, C4 line cleaning, and corpus-global line
  * dedup — the published-pipeline document filters. */
class CurationSpec extends SparkSpec {

  test("gopherSignals: word/line stats on structured text") {
    val s = spark
    import s.implicits._
    val text =
      "The quick brown fox jumps over the lazy dog today.\n" +
        "- bullet item one\n" +
        "* bullet item two\n" +
        "trailing thought...\n" +
        "# # # hash noise …"
    val df = Seq((1L, text)).toDF("id", "text")
    val sig = Curation.gopherSignals(col("text"))
    val r = df.select(sig("n_words").as("nw"), sig("mean_word_len").as("ml"),
      sig("symbol_word_ratio").as("sr"), sig("bullet_line_frac").as("bf"),
      sig("ellipsis_line_frac").as("ef"), sig("alpha_word_frac").as("af"),
      sig("stop_hits").as("sh")).head()
    assert(r.getAs[Long]("nw") == 26)
    // 3 '#' + 1 '…' + 1 "..." = 5 symbols over 26 words
    assert(math.abs(r.getAs[Double]("sr") - 5.0 / 26.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("bf") - 2.0 / 5.0) < 1e-12)
    // both "trailing thought..." and the final '…' line end in ellipsis
    assert(math.abs(r.getAs[Double]("ef") - 2.0 / 5.0) < 1e-12)
    // "-", "*", 3× "#", and "…" carry no ASCII letter: 20 of 26 alphabetic
    assert(math.abs(r.getAs[Double]("af") - 20.0 / 26.0) < 1e-12)
    assert(r.getAs[Long]("sh") == 1) // only "the" from the required list
  }

  test("gopherPass: paper thresholds accept clean prose, reject noise") {
    val s = spark
    import s.implicits._
    val good = (1 to 10).map(i =>
      s"The data of run $i and the batch that we have with it arrived fine.")
      .mkString(" ")
    val short = "too short to pass."
    val symbols = Seq.fill(60)("#tag").mkString(" ")
    val df = Seq((1L, good), (2L, short), (3L, symbols)).toDF("id", "text")
    val got = df.select(col("id"), Curation.gopherPass(col("text")).as("p"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("c4CleanLines: word-count, punctuation, and pattern rules per line; doc drops") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "This is a fine sentence with many words.\nshort line\nEnable javascript to view this content now.\nAnother good long sentence ends properly here!"),
      (2L, "lorem ipsum dolor sit amet and then some more words here."),
      (3L, "A sentence that is long enough to stay.")).toDF("doc_id", "text")
    val out = Curation.c4CleanLines(df, "doc_id", split(col("text"), "\n"),
      minWords = 5, requirePunct = true, textCol = "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") ==
      "This is a fine sentence with many words.\nAnother good long sentence ends properly here!")
    assert(out(0).getAs[Long]("n_kept") == 2 && out(0).getAs[Long]("n_dropped") == 2)
    assert(!out(0).getAs[Boolean]("doc_dropped"))
    assert(out(1).getAs[Boolean]("doc_dropped") && out(1).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[Long]("n_kept") == 1 && out(2).getAs[Long]("n_dropped") == 0)
  }

  test("wordWindows: tiling, tail window, empty text") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "  ")).toDF("id", "text")
    val r = df.select(col("id"), Curation.wordWindows(col("text"), 3).as("w"))
      .orderBy("id").collect()
    assert(r(0).getSeq[String](1) == Seq("a b c", "d e f", "g"))
    assert(r(1).getSeq[String](1).isEmpty && r(2).getSeq[String](1).isEmpty)
  }

  test("globalLineDedup: first occurrence wins in (id, pos) order; docs reassemble") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (10L, Array("alpha beta", "gamma delta", "alpha beta")), // self-repeat
      (20L, Array("gamma delta", "unique here")), // cross-doc repeat
      (30L, Array("alpha beta")), // fully duplicated doc
      (40L, Array.empty[String])).toDF("doc_id", "lines")
    val out = Curation.globalLineDedup(df, "doc_id", col("lines"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_dedup") == "alpha beta\ngamma delta")
    assert(out(0).getAs[Long]("n_kept") == 2 && out(0).getAs[Long]("n_dropped") == 1)
    assert(out(1).getAs[String]("text_dedup") == "unique here")
    assert(out(1).getAs[Long]("n_dropped") == 1)
    assert(out(2).getAs[String]("text_dedup") == "" && out(2).getAs[Long]("n_kept") == 0)
    assert(out(3).getAs[String]("text_dedup") == "" && out(3).getAs[Long]("n_dropped") == 0)
  }

  test("exactSpanDedup: shared passage survives only at its first occurrence") {
    val s = spark
    import s.implicits._
    val passage = "one two three four five six" // 6 words, covers two 5-grams
    val df = Seq(
      (10L, s"intro words here $passage and a tail"),
      (20L, s"other start then $passage closing words"),
      (30L, "totally unrelated text with enough words present")).toDF("doc_id", "text")
    val out = Curation.exactSpanDedup(df, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    // doc 10 is the (id, pos) first occurrence: untouched
    assert(out(0).getAs[Long]("n_removed") == 0)
    assert(out(0).getAs[String]("text_dedup") ==
      s"intro words here $passage and a tail")
    // doc 20 loses exactly the passage — two overlapping covered 5-grams
    // merged into ONE maximal 6-word span
    assert(out(1).getAs[Long]("n_removed") == 6)
    assert(out(1).getAs[Long]("n_spans") == 1)
    assert(out(1).getAs[String]("text_dedup") == "other start then closing words")
    assert(out(2).getAs[Long]("n_removed") == 0)
  }

  test("exactSpanDedup: within-doc repeat, full-doc duplicate, short docs") {
    val s = spark
    import s.implicits._
    val rep = "a b c d e"
    val df = Seq(
      (1L, s"$rep x y $rep"),          // self-repeat: second copy removed
      (2L, "p q r s t u v w"),         // first occurrence of doc 3's text
      (3L, "p q r s t u v w"),         // full duplicate: empties
      (4L, "just four words"),         // shorter than l: untouched
      (5L, "")).toDF("doc_id", "text") // empty: untouched
    val out = Curation.exactSpanDedup(df, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_dedup") == s"$rep x y")
    assert(out(0).getAs[Long]("n_removed") == 5 && out(0).getAs[Long]("n_spans") == 1)
    assert(out(1).getAs[Long]("n_removed") == 0)
    assert(out(2).getAs[String]("text_dedup") == "" &&
      out(2).getAs[Long]("n_removed") == 8 && out(2).getAs[Long]("n_spans") == 1)
    assert(out(3).getAs[Long]("n_removed") == 0 &&
      out(3).getAs[String]("text_dedup") == "just four words")
    assert(out(4).getAs[Long]("n_words") == 0 &&
      out(4).getAs[String]("text_dedup") == "")
  }

  test("exactSpanDedup: disjoint duplicated spans count separately") {
    val s = spark
    import s.implicits._
    val p1 = "m n o p q"
    val p2 = "f g h i j"
    val df = Seq(
      (1L, s"$p1 gap words $p2"),
      (2L, s"$p1 other middle piece $p2 end")).toDF("doc_id", "text")
    val out = Curation.exactSpanDedup(df, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0)
    assert(out(1).getAs[Long]("n_removed") == 10 &&
      out(1).getAs[Long]("n_spans") == 2)
    assert(out(1).getAs[String]("text_dedup") == "other middle piece end")
  }

  test("exactSpanDedup: fully-covered long document empties cleanly") {
    val s = spark
    import s.implicits._
    // 5000-word doc fully duplicated: the interval rebuild must collapse
    // the whole cover to ONE span and an empty survivor — the case the
    // old per-position array_contains scan made quadratic
    val long = (1 to 5000).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val out = Curation.exactSpanDedup(df, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0)
    assert(out(1).getAs[Long]("n_removed") == 5000 &&
      out(1).getAs[Long]("n_spans") == 1 &&
      out(1).getAs[String]("text_dedup") == "")
  }

  test("exactSpanDedupChars: first occurrence kept, span merged, edges") {
    val s = spark
    import s.implicits._
    val passage = "shared-passage!" // 15 chars -> six 10-grams, cover 1..15
    val df = Seq(
      (10L, s"AB${passage}CD"),          // first occurrence: untouched
      (20L, s"${passage}-mid-$passage"), // spans at doc start AND doc end
      (30L, "completely different")).toDF("doc_id", "text")
    val out = Curation.exactSpanDedupChars(df, "doc_id", "text", 10)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0 &&
      out(0).getAs[String]("text_dedup") == s"AB${passage}CD")
    // doc 20: both copies follow doc 10's -> both removed; the survivor
    // is the middle, exercising zero-length head and tail gaps
    assert(out(1).getAs[Long]("n_removed") == 30 &&
      out(1).getAs[Long]("n_spans") == 2 &&
      out(1).getAs[String]("text_dedup") == "-mid-")
    assert(out(2).getAs[Long]("n_removed") == 0)
  }

  test("exactSpanDedupChars: code-point semantics over non-BMP text") {
    val s = spark
    import s.implicits._
    // 10 code points, 12 UTF-16 units: pins that length/substr/grams all
    // count CODE POINTS (an emoji is one char), matching DuckDB's
    // character semantics for the oracle replay
    val passage = "😀😀abcdefgh"
    val df = Seq(
      (1L, s"XX$passage"),
      (2L, s"YY${passage}Z")).toDF("doc_id", "text")
    val out = Curation.exactSpanDedupChars(df, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_chars") == 12) // 2 + 10 code points
    assert(out(0).getAs[Long]("n_removed") == 0)
    assert(out(1).getAs[Long]("n_chars") == 13)
    assert(out(1).getAs[Long]("n_removed") == 10 &&
      out(1).getAs[Long]("n_spans") == 1 &&
      out(1).getAs[String]("text_dedup") == "YYZ")
  }

  test("exactSpanDedupChars: fully-covered doc and sub-l docs") {
    val s = spark
    import s.implicits._
    val long = ("x" * 7 + "y") * 300 // 2400 chars, repetitive but doc-unique
    val df = Seq(
      (1L, long), (2L, long),   // full duplicate: doc 2 empties
      (3L, "tiny"), (4L, "")).toDF("doc_id", "text")
    val out = Curation.exactSpanDedupChars(df, "doc_id", "text", 20)
      .orderBy("doc_id").collect()
    // doc 1 self-covers too (the 8-char period repeats internally), but
    // its very first gram occurrence survives by the per-gram guarantee
    assert(out(0).getAs[Long]("n_chars") == 2400)
    assert(out(1).getAs[Long]("n_removed") == 2400 &&
      out(1).getAs[String]("text_dedup") == "")
    assert(out(2).getAs[Long]("n_removed") == 0 &&
      out(2).getAs[String]("text_dedup") == "tiny")
    assert(out(3).getAs[Long]("n_chars") == 0)
  }

  test("exactSpanDedupCharsSharded: row-for-row equal to the unsharded pass at shards 1 and 3") {
    val s = spark
    import s.implicits._
    // shared passages + internal repetition + non-BMP + empty docs — the
    // cases the unsharded tests pin, all in one corpus
    val passage = "the-shared-duplicated-passage-0123456789"
    val rows = (0L until 40L).map { i =>
      val body =
        if (i % 4 == 0) s"doc$i head $passage tail$i"
        else if (i % 4 == 1) s"$passage-mid$i-$passage"
        else if (i % 4 == 2) ("x" * 7 + "y") * 20 + s"#$i"
        else s"unique😀${i}doc body with no repeats at all ${i * 37}"
      (i, body)
    } :+ ((40L, ""))
    val df = rows.toDF("doc_id", "text")
    val expect = Curation.exactSpanDedupChars(df, "doc_id", "text", 20)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    Seq(1, 3).foreach { k =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"span_shard_$k").toString
      val got = Curation.exactSpanDedupCharsSharded(df, "doc_id", "text",
          20, k, dir)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == expect, s"shards=$k diverged from unsharded")
    }
  }

  test("canonicalizeUrl: case, userinfo, default ports, fragment, empty path; " +
      "idempotent; non-URLs pass through") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // scheme+host lowercase, default port stripped, fragment dropped
      (1L, "HTTP://WWW.Ex.COM:80/A/b?Q=1#frag", "http://www.ex.com/A/b?Q=1"),
      // https default port; path case PRESERVED (paths are case-sensitive)
      (2L, "HTTPS://Host.Com:443/Path", "https://host.com/Path"),
      // non-default port kept; userinfo stripped
      (3L, "https://user:pw@Host.com:8080/x", "https://host.com:8080/x"),
      // empty path -> '/'
      (4L, "http://A.b", "http://a.b/"),
      (5L, "http://A.b#only-frag", "http://a.b/"),
      // query kept even with empty path
      (6L, "http://A.b?q=2", "http://a.b?q=2"),
      // :80 is http's default, NOT https's
      (7L, "https://h.com:80/x", "https://h.com:80/x"),
      // non-URL: only the fragment is dropped
      (8L, "plain text #tag", "plain text "),
      (9L, "mailto:a@b.c", "mailto:a@b.c"))
    val df = cases.map { case (i, u, _) => (i, u) }.toDF("id", "url")
    val got = df.select(col("id"),
        Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (i, u, want) =>
      assert(got(i) == want, s"canon($u) = ${got(i)}, want $want")
    }
    // idempotent: canon(canon(x)) == canon(x)
    val twice = df.select(col("id"), Curation.canonicalizeUrl(
        Curation.canonicalizeUrl(col("url"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
    // host extraction drops the (non-default) port
    val host = df.filter(col("id") === 3L).select(
      Curation.urlHost(Curation.canonicalizeUrl(col("url")))).head.getString(0)
    assert(host == "host.com")
  }
}
