package graft

import graft.functions.VectorFunctions._
import graft.operators.{Crud, Dedup, Search}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY §5): metric axioms, top-k invariants,
  * dedup set-semantics, upsert algebra — over generated inputs.
  * (scalatestplus isn't on the offline classpath, so samples are drawn
  * from Gens directly with fixed seeds — deterministic across runs.) */
class PropertySpec extends SparkSpec {

  /** Draw n deterministic samples from gen and assert f on each. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(a => withClue(s"sample #$i: $a\n")(f(a)))
    }

  private def withClue[T](clue: String)(body: => T): T =
    try body catch {
      case e: org.scalatest.exceptions.TestFailedException =>
        throw e.modifyMessage(m => Some(clue + m.getOrElse("")))
    }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-10f, 10f)).map(_.toArray)

  test("L2 distance: symmetry, identity, non-negativity (kernel path)") {
    forAllSamples(Gen.zip(vecGen, vecGen)) { case (a, b) =>
      val s = spark
      import s.implicits._
      val r = Seq((a, b)).toDF("a", "b")
        .select(l2(col("a"), col("b")).as("ab"), l2(col("b"), col("a")).as("ba"),
          l2(col("a"), col("a")).as("aa"))
        .head
      assert(r.getDouble(0) == r.getDouble(1)) // symmetric, bitwise
      assert(r.getDouble(2) == 0.0)            // identity
      assert(r.getDouble(0) >= 0.0)
    }
  }

  test("knnExact: results are sorted, unique, and are the true k nearest") {
    forAllSamples(Gen.zip(Gen.chooseNum(1, 10), Gen.chooseNum(11L, 99L)), n = 6) { case (k, seed) =>
      val data = corpus(30, 4, seed)
      val res = Search.knnExact(toDF(data), "id", "embedding", data.head._2.toSeq, k)
        .collect()
      assert(res.length == k)
      val dists = res.map(_.getAs[Double]("dist"))
      assert(dists.sameElements(dists.sorted))
      val ids = res.map(_.getAs[Long]("id"))
      assert(ids.distinct.length == ids.length)
      // oracle: brute force in Scala with the same tie-break
      val exact = data.map { case (id, v) =>
        val d = math.sqrt(v.zip(data.head._2)
          .map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum)
        (d, id)
      }.sorted.take(k).map(_._2)
      assert(ids.toSeq == exact.toSeq)
    }
  }

  test("minhash signatures are permutation-invariant over word sets (shingle=1)") {
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    forAllSamples(Gen.zip(wordGen, Gen.chooseNum(1L, 999L)), n = 6) { case (words, seed) =>
      val s = spark
      import s.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(words)
      val df = Seq((0L, words.mkString(" ")), (1L, shuffled.mkString(" ")))
        .toDF("doc_id", "text")
      val sig = Dedup.minhashSignature(df, "doc_id", "text", numHashes = 4, shingle = 1)
        .select("doc_id", "minhash").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(sig(0L) == sig(1L))
    }
  }

  test("range join equals the brute theta join for random windows and data") {
    import graft.operators.RangeJoin
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 5000L)))
    forAllSamples(Gen.zip(rowGen, rowGen, Gen.chooseNum(1L, 900L)), n = 5) {
      case (ls, rs, winSec) =>
        val s = spark
        import s.implicits._
        val w = winSec * 1000000L
        val left = ls.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t)) }
          .toDF("lid", "k", "t")
        val right = rs.zipWithIndex
          .map { case ((k, t), i) => (i.toLong + 1000, k, new java.sql.Timestamp(t)) }
          .toDF("rid", "k", "rt")
        val got = RangeJoin.innerPairs(left, "k", col("t"), right, "k", col("rt"),
            w, Seq("rid"))
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          ((lk, lt), li) <- ls.zipWithIndex
          ((rk, rt), ri) <- rs.zipWithIndex
          ltu = lt * 1000 // Timestamp(ms) → micros
          rtu = rt * 1000
          if lk == rk && rtu <= ltu && rtu >= ltu - w
        } yield (li.toLong, ri.toLong + 1000)).toSet
        assert(got == want)
    }
  }

  test("LSH: identical vectors always share a bucket; signature matches driver") {
    import graft.operators.Lsh
    forAllSamples(Gen.zip(vecGen, Gen.chooseNum(1L, 99L)), n = 6) { case (v, seed) =>
      val model = Lsh.fit(8, nBits = 10, seed)
      val s = spark
      import s.implicits._
      val assigned = Lsh.assign(Seq((0L, v), (1L, v.clone()))
        .toDF("id", "embedding"), "embedding", model)
      val buckets = assigned.select("id", Lsh.BucketCol).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(buckets(0L) == buckets(1L))
      assert(buckets(0L) == Lsh.signature(v.toSeq, model))
    }
  }

  test("WAV/BMP codecs: encode∘decode = id over generated payloads (pure JVM, no Spark)") {
    import graft.operators.MediaCodec
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    forAllSamples(Gen.zip(bytesGen, Gen.chooseNum(1, 48000)), n = 20) {
      case (data, rate) =>
        val (m8, s8) = MediaCodec.decodeWav(MediaCodec.encodeWav(data, rate))
        assert(m8.sampleRate == rate && m8.nSamples == data.length.toLong)
        assert(s8.toSeq == data.toSeq.map(b => (b & 0xff) - 128))
        val d16 = if (data.length % 2 == 0) data else data.dropRight(1)
        val (m16, s16) = MediaCodec.decodeWav(
          MediaCodec.encodeWav(d16, rate, bitsPerSample = 16))
        assert(m16.nSamples == d16.length / 2)
        assert(s16.toSeq == (0 until d16.length / 2).map(i =>
          ((d16(2 * i) & 0xff) | (d16(2 * i + 1) << 8)).toShort.toInt))
    }
    val dimGen = Gen.zip(Gen.chooseNum(1, 9), Gen.chooseNum(1, 7))
    forAllSamples(dimGen, n = 15) { case (w, h) =>
      val rnd = new scala.util.Random(w * 31 + h)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val (w2, h2, back) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, rgb))
      assert(w2 == w && h2 == h && back.toSeq == rgb.toSeq)
    }
  }

  test("boilerplateRemove: minDocFreq above corpus size is the identity") {
    val s = spark
    import s.implicits._
    val docGen = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dd")).map(_.mkString(" ")))
    forAllSamples(docGen, n = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val r = Dedup.boilerplateRemove(df, "doc_id", "text", " ",
          minDocFreq = texts.length + 1L)
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      // nothing reaches the doc-frequency bar → text round-trips
      // (modulo collapsed empty segments from double spaces — inputs
      // here are single-spaced)
      texts.zipWithIndex.foreach { case (t, i) => assert(r(i.toLong) == t) }
    }
  }

  test("BPE: tokens concatenate back to the word; merges never increase count") {
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))
    forAllSamples(docGen, n = 8) { text =>
      val s = spark
      import s.implicits._
      import graft.operators.Bpe
      val df = Seq((0L, text)).toDF("id", "text")
      val chains = Seq(Seq.empty[(String, String)], Seq("a" -> "b"),
        Seq("a" -> "a"), Seq("a" -> "b", "ab" -> "c"))
      val counts = chains.map { chain =>
        val toks = df.select(Bpe.tokens(col("text"), chain)).head.getSeq[String](0)
        // lossless: concatenated tokens == the whitespace-stripped text
        assert(toks.mkString == text.replaceAll("\\s+", ""),
          s"chain $chain lost characters on '$text'")
        toks.length
      }
      // the empty chain yields character count; each merge chain can
      // only reduce (or keep) the token count
      val charCount = text.replaceAll("\\s+", "").length
      assert(counts.head == charCount)
      counts.tail.foreach(c => assert(c <= charCount))
      // deeper chain (superset of merges) never exceeds its prefix chain
      assert(counts(3) <= counts(1))
    }
  }

  test("byte-level BPE: hex tokens concatenate back to the UTF-8 bytes") {
    // mixed alphabet incl. multi-byte codepoints, a surrogate pair,
    // punctuation and double spaces — byte-level must represent ALL of
    // it with no out-of-vocabulary loss, under any merge chain
    val pieceGen = Gen.oneOf("a", "b", "th", " ", ".", "!", "1", "42",
      "é", "ß", "中", "😀", "  ", "'")
    val docGen = Gen.nonEmptyListOf(pieceGen).map(_.mkString)
    forAllSamples(docGen, n = 8) { text =>
      val s = spark
      import s.implicits._
      import graft.operators.ByteBpe
      val df = Seq((0L, text)).toDF("id", "text")
      val expectedHex =
        text.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      val chains = Seq(Seq.empty[(String, String)], Seq("74" -> "68"),
        Seq("74" -> "68", "7468" -> "65"), Seq("20" -> "61"),
        Seq("C3" -> "A9"), Seq("F0" -> "9F"))
      chains.foreach { chain =>
        val toks = df.select(ByteBpe.tokens(col("text"), chain))
          .head.getSeq[String](0)
        assert(toks.mkString == expectedHex,
          s"chain $chain lost bytes on '$text'")
        // pre-tokens partition the input exactly
        val pts = df.select(ByteBpe.preTokens(col("text")))
          .head.getSeq[String](0)
        assert(pts.mkString == text)
      }
    }
  }

  test("upsert: updates win, inserts append, ids stay unique") {
    val kvGen = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.alphaStr))
    forAllSamples(Gen.zip(kvGen, kvGen), n = 6) { case (base, updates) =>
      val s = spark
      import s.implicits._
      val baseDf = base.distinctBy(_._1).toDF("id", "v")
      val updDf = updates.distinctBy(_._1).toDF("id", "v")
      val result = Crud.upsert(baseDf, updDf, "id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = base.distinctBy(_._1).toMap ++ updates.distinctBy(_._1).toMap
      assert(result == expected)
    }
  }
}
