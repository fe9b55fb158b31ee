package graft

import graft.functions.PiiFunctions
import graft.operators.{Chunker, Contamination}
import org.apache.spark.sql.functions._

/** PII redaction, contamination screening, chunking, and sequence
  * packing — the curation/layout operators between a raw corpus and
  * trainable samples. */
class CurationOpsSpec extends SparkSpec {

  test("piiSignals/redactPii: counts and placeholders per class, clean text untouched") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org or x@y.io, call +1-555-0199, host 10.0.0.1"),
      (2L, "no pii here, just 1.2 version text and a+b@ invalid"),
      (3L, "+12-123-4567 then 255.255.255.255 and bob@corp.net")).toDF("id", "text")
    val sig = PiiFunctions.piiSignals(col("text"))
    val rows = df.select(col("id"), sig("n_emails"), sig("n_phones"), sig("n_ipv4"),
        PiiFunctions.redactPii(col("text")).as("red"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == 2 && rows(0).getLong(2) == 1 && rows(0).getLong(3) == 1)
    assert(rows(0).getString(4) ==
      "mail [EMAIL] or [EMAIL], call [PHONE], host [IP]")
    assert(rows(1).getLong(1) == 0 && rows(1).getLong(2) == 0 && rows(1).getLong(3) == 0)
    assert(rows(1).getString(4) == rows(1).getString(4)) // unchanged shape
    assert(rows(2).getString(4) == "[PHONE] then [IP] and [EMAIL]")
  }

  test("contamination: shared-gram counting, minShared gate, decontaminate anti-join") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox appeared"), // shares "the quick brown", "quick brown fox"
      (2L, "quick brown fox jumps over a fence"), // shares 3 grams
      (3L, "completely unrelated text about spark engines"), // 0 shared
      (4L, "the quick red fox")).toDF("doc_id", "text") // ≤1 shared gram
    val hit = Contamination.overlap(corpus, bench, "doc_id", "text", n = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hit.keySet == Set(1L, 2L))
    assert(hit(1L) == 2 && hit(2L) == 3)
    val clean = Contamination.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L))
  }

  test("chunk: coverage, overlap, short-doc and exact-boundary cases") {
    val s = spark
    import s.implicits._
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, "short doc"), (3L, (1 to 48).map(i => s"v$i").mkString(" ")))
      .toDF("id", "text")
    val out = Chunker.chunk(df, "id", "text", chunkTokens = 32, overlap = 8)
      .orderBy("id", "chunk_id").collect()
    val doc1 = out.filter(_.getLong(0) == 1L)
    // 100 tokens, stride 24: ceil((100-8)/24) = 4 chunks
    assert(doc1.length == 4)
    assert(doc1.head.getString(2).startsWith("w1 w2 ") && doc1.head.getLong(3) == 32)
    // consecutive chunks share exactly `overlap` tokens
    val c0 = doc1(0).getString(2).split(" ")
    val c1 = doc1(1).getString(2).split(" ")
    assert(c0.takeRight(8).sameElements(c1.take(8)))
    // last chunk is short (tokens 73..100 = 28), not dropped
    assert(doc1(3).getLong(3) == 28)
    // every token is covered in order
    assert(doc1.flatMap(_.getString(2).split(" ")).distinct.length == 100)
    assert(out.filter(_.getLong(0) == 2L).map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((0L, "short doc")))
    // 48 tokens: ceil((48-8)/24) = 2 chunks, second is tokens 25..48
    val doc3 = out.filter(_.getLong(0) == 3L)
    assert(doc3.length == 2 && doc3(1).getLong(3) == 24)
  }

  test("sentenceChunks: boundaries respected, capacity bins, lossless rejoin, edges") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // 4 sentences of 3/4/3/2 tokens; capacity 6 → bins at cum 0,3,7,10
      // = chunks {s0,s1}, {s2,s3} (cum 7 div 6 = 1, 10 div 6 = 1)
      (1L, "one two three. four five six seven! eight nine ten? end end"),
      // a single giant sentence above capacity stays WHOLE
      (2L, (1 to 20).map(i => s"w$i").mkString(" ") + "."),
      // unterminated tail sentence; punctuation-only segment
      (3L, "alpha beta. gamma delta"),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Chunker.sentenceChunks(df, "id", "text", capacityTokens = 6)
      .orderBy("id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length == 2)
    assert(d1(0).getAs[String]("chunk_text") == "one two three. four five six seven! ")
    assert(d1(0).getAs[Long]("n_sentences") == 2L &&
      d1(0).getAs[Long]("n_chunk_tokens") == 7L)
    assert(d1(1).getAs[String]("chunk_text") == "eight nine ten? end end")
    // chunks concatenate back to the original text, nothing lost
    assert(d1.map(_.getAs[String]("chunk_text")).mkString ==
      "one two three. four five six seven! eight nine ten? end end")
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[Long]("n_chunk_tokens") == 20L,
      "an over-capacity sentence must stay whole")
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.map(_.getAs[String]("chunk_text")).mkString == "alpha beta. gamma delta")
    // empty and null docs yield no rows (documented contract)
    assert(!out.exists(r => r.getLong(0) >= 4L))
    // chunk ids dense from 0 per doc
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("chunk_id")).sorted.sameElements(
        rs.indices.map(_.toLong)))
    }
    // partitioning invariance
    val many = Chunker.sentenceChunks(df.repartition(7), "id", "text", 6)
      .orderBy("id", "chunk_id").collect()
    assert(out.map(_.toSeq).toSeq == many.map(_.toSeq).toSeq)
  }

  test("packOffsets: matches a sequential scan, invariant to partition count") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, 1L + rnd.nextInt(300)))
    val df = docs.toDF("id", "n_tok").repartition(13) // scrambled input layout
    val cap = 512L
    // sequential reference
    var cum = 0L
    val expect = docs.sortBy(_._1).map { case (id, nt) =>
      val r = (id, nt, cum / cap, cum % cap); cum += nt; r
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = Chunker.packOffsets(df, "id", "n_tok", cap, numPartitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == expect, s"parts=$parts")
    }
    // pack ids are dense: every pack below the last one exists
    val packs = expect.map(_._3).toSet
    assert(packs == (0L to expect.last._3).toSet)
  }

  test("packWindows: slices tile every window and reassemble every document") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // lengths straddle the capacity: some docs fit, some span 2+ windows,
    // zero-token docs must vanish
    val docs = (0L until 200L).map(i =>
      (i, if (i % 17 == 0) 0L else 1L + rnd.nextInt(250)))
    val df = docs.toDF("id", "n_tok").repartition(7)
    val cap = 128L
    val rows = Chunker.packWindows(df, "id", "n_tok", cap, numPartitions = 4)
      .select("id", "n_tok", "win_id", "win_offset", "slice_start", "slice_len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per document: slices cover [0, n_tok) contiguously in win_id order
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains(0L) && !byDoc.contains(17L), "0-token docs emit no rows")
    docs.filter(_._2 > 0).foreach { case (id, nt) =>
      val slices = byDoc(id).sortBy(_._3).map(t => (t._5, t._6))
      assert(slices.head._1 == 0L && slices.map(_._2).sum == nt,
        s"doc $id slices $slices don't reassemble $nt tokens")
      slices.sliding(2).foreach {
        case Array((s0, l0), (s1, _)) => assert(s0 + l0 == s1)
        case _ =>
      }
    }
    // per window: placements tile [0, cap) with no gaps or overlaps
    // (the final window may end short)
    val lastWin = rows.map(_._3).max
    rows.groupBy(_._3).foreach { case (win, ws) =>
      val placed = ws.sortBy(_._4).map(t => (t._4, t._6))
      assert(placed.head._1 == 0L, s"window $win starts at ${placed.head._1}")
      placed.sliding(2).foreach {
        case Array((o0, l0), (o1, _)) =>
          assert(o0 + l0 == o1, s"window $win gap/overlap at $o1")
        case _ =>
      }
      val end = placed.last._1 + placed.last._2
      assert(end == cap || (win == lastWin && end <= cap),
        s"window $win ends at $end")
    }
    // total conservation: every token is placed exactly once
    assert(rows.map(_._6).sum == docs.map(_._2).sum)
  }

  test("chunk: null text behaves like empty text — the doc still yields a chunk") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("id", "text")
    val r = Chunker.chunk(df, "id", "text", chunkTokens = 4, overlap = 0)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r.size == 2 && r(1L) == "" && r(2L) == "a b")
  }

  test("chunk: no phantom tokens — empty docs count 0, whitespace doesn't shift windows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, ""), (2L, " a b"), (3L, "a b")).toDF("id", "text")
    val r = Chunker.chunk(df, "id", "text", chunkTokens = 2, overlap = 0)
      .collect().map(x => (x.getLong(0), x.getString(2), x.getLong(3)))
    assert(r.filter(_._1 == 1L).toSeq == Seq((1L, "", 0L)),
      "empty doc must report 0 chunk tokens, not a phantom 1")
    // leading whitespace must not shift the window: docs 2 and 3 chunk identically
    assert(r.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq ==
      r.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq)
  }

  test("packOffsets: null token count fails fast with a usable message") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(5L)), (2L, None)).map { case (i, t) => (i, t) }
      .toDF("id", "n_tok")
    val e = intercept[Exception] {
      Chunker.packOffsets(df, "id", "n_tok", 8L).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-negative"))
  }

  test("packOffsets: payload columns pass through unchanged") {
    val s = spark
    import s.implicits._
    val df = Seq((2L, 10L, "b"), (0L, 5L, "a"), (1L, 7L, "x"))
      .toDF("id", "n_tok", "tag").repartition(3)
    val r = Chunker.packOffsets(df, "id", "n_tok", 8L, numPartitions = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(2), x.getLong(3), x.getLong(4)))).toMap
    // id order: 0 (cum 0) → pack 0 off 0; 1 (cum 5) → pack 0 off 5;
    // 2 (cum 12) → pack 1 off 4. tag survives beside them.
    assert(r == Map(0L -> (("a", 0L, 0L)), 1L -> (("x", 0L, 5L)),
      2L -> (("b", 1L, 4L))))
  }

  test("packOffsets: spillDir checkpoint path matches the cached path exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map(i => (i, 1L + rnd.nextInt(200), s"p$i"))
    val df = docs.toDF("id", "n_tok", "payload").repartition(7)
    val spill = java.nio.file.Files.createTempDirectory("packspill").toString
    val cached = Chunker.packOffsets(df, "id", "n_tok", 256L, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val spilled = Chunker.packOffsets(df, "id", "n_tok", 256L, numPartitions = 4,
        spillDir = Some(s"$spill/stage"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(spilled == cached)
    // the staged projection really landed on disk (lineage is cut there)
    assert(s.read.parquet(s"$spill/stage").count() == 300L)
  }

  test("packOffsets: empty input and capacity guard") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "n_tok")
    assert(Chunker.packOffsets(empty, "id", "n_tok", 128).count() == 0)
    intercept[IllegalArgumentException] {
      Chunker.packOffsets(empty, "id", "n_tok", 0)
    }
  }

  test("htmlStrip: tags/comments/script/style/entities, word boundaries kept") {
    val s = spark
    import s.implicits._
    import graft.operators.Curation
    val df = Seq(
      (1L, "<html><head><title> My  Page </title><style>p{x:1}</style></head>" +
        "<body><h1>Hi</h1><!-- secret <b>note</b> -->a<p>b</p>" +
        "<SCRIPT type=\"x\">var y = '<p>';</SCRIPT >tail</body></html>"),
      // entity decode AFTER tag strip, &amp; decoded LAST: &amp;lt;
      // yields the literal string "&lt;", never "<"
      (2L, "<p>x &lt;b&gt; y &amp;lt; z &quot;q&quot; &#39;a&#39;&nbsp;end</p>"),
      (3L, "plain   text\twith\nspace runs"), // no markup: collapse only
      (4L, "")).toDF("id", "html")
    val out = df.select(col("id"),
        Curation.htmlStrip(col("html")).as("clean"),
        Curation.htmlTitle(col("html")).as("title"))
      .orderBy("id").collect()
    // title text is prose and survives in the flow; only script/style
    // carry their payloads away
    assert(out(0).getString(1) == "My Page Hi a b tail")
    assert(out(0).getString(2) == "My Page")
    assert(out(1).getString(1) == "x <b> y &lt; z \"q\" 'a' end")
    assert(out(1).getString(2) == "")
    assert(out(2).getString(1) == "plain text with space runs")
    assert(out(3).getString(1) == "")
  }
}
