package graft

import graft.operators.MultiVec
import org.apache.spark.sql.functions._

class MultiVecSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("windows: fixed-width boundaries cover the text exactly") {
    val d = docs((1L, "a" * 130), (2L, "xy"))
    val w = MultiVec.windows(d, "id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val one = w.filter(_._1 == 1L).sortBy(_._2)
    assert(one.map(_._2).toSeq == Seq(0, 1, 2))
    assert(one.map(_._3.length).toSeq == Seq(64, 64, 2))
    assert(one.map(_._3).mkString == "a" * 130)
    assert(w.filter(_._1 == 2L).map(_._3).toSeq == Seq("xy"))
  }

  test("windows: empty text yields one empty window, dropped by embedding") {
    val d = docs((1L, ""), (2L, "hello world"))
    assert(MultiVec.windows(d, "id", "text", 64).count() == 2)
    val emb = MultiVec.windowEmbeddings(d, "id", "text", 64, 16)
    assert(emb.select("id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("maxsim: a window repeating a segment verbatim scores that segment 1.0") {
    // doc 1 holds segment A in its own window (width padding with spaces)
    val segA = "alpha beta gamma"
    val pad = segA + (" " * (64 - segA.length))
    val d = docs((1L, pad + "unrelated words here"), (2L, "totally other content"))
    val r = MultiVec.maxsimSearch(d, "id", "text", Seq(segA), k = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 1.0) < 1e-12, s"verbatim window cosine ${r(1L)} != 1")
    assert(r(1L) > r(2L))
  }

  test("maxsim: all segments verbatim scores Q, and tops partial matches") {
    val segs = Seq("red fox", "lazy dog", "quick brown")
    def pad(s: String) = s + (" " * (64 - s.length))
    // doc 1: each segment sits verbatim in its own window -> max cosine 1
    // per segment -> score = 3. Docs 2/3 can score anywhere below that
    // (signed hashing makes non-matching sims negative, not zero).
    val d = docs(
      (1L, segs.map(pad).mkString),
      (2L, pad(segs.head) + "unrelated filler words beyond"),
      (3L, "entirely disjoint vocabulary in this document"))
    val top = MultiVec.maxsimSearch(d, "id", "text", segs, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head._1 == 1L, s"unexpected ranking: ${top.toSeq}")
    assert(math.abs(top.head._2 - 3.0) < 1e-12,
      s"all-verbatim doc should score Q=3, got ${top.head._2}")
    assert(top.drop(1).forall(_._2 < 3.0))
  }

  test("maxsim rejects empty or token-less query segments") {
    val d = docs((1L, "some text"))
    intercept[IllegalArgumentException] {
      MultiVec.maxsimSearch(d, "id", "text", Seq.empty, k = 1)
    }
    intercept[IllegalArgumentException] {
      MultiVec.maxsimSearch(d, "id", "text", Seq("   "), k = 1)
    }
  }
}
