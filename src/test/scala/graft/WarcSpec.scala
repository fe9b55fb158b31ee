package graft

import graft.sources.{Warc, WarcRecord}

/** WARC crawl-corpus reader: record round-trip, gzip member
  * concatenation, lenient resync over garbage, truncated-tail drop. */
class WarcSpec extends SparkSpec {

  private def rec(id: Long, text: String): Array[Byte] =
    Warc.recordBytes("resource", s"urn:doc:$id", s"graft://d/$id",
      text.getBytes("UTF-8"))

  test("parseAll round-trips records and header fields") {
    val bytes = rec(1, "alpha text") ++ rec(2, "beta — utf8 ✓")
    val got = Warc.parseAll("f", bytes).toSeq
    assert(got.map(_.record_id) == Seq("urn:doc:1", "urn:doc:2"))
    assert(got.map(_.payload) == Seq("alpha text", "beta — utf8 ✓"))
    assert(got.forall(_.warc_type == "resource"))
    assert(got.head.content_length ==
      "alpha text".getBytes("UTF-8").length.toLong)
    assert(got(1).content_length ==
      "beta — utf8 ✓".getBytes("UTF-8").length.toLong)
    assert(got.map(_.target_uri) == Seq("graft://d/1", "graft://d/2"))
  }

  test("lenient scan: garbage and malformed records are skipped, not fatal") {
    val junk = "WARC/1.0\r\nno colon here\r\n\r\n".getBytes("UTF-8")
    val noise = "random bytes between records".getBytes("UTF-8")
    // truncated tail: header claims more payload than remains
    val truncated = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes("UTF-8")
    val bytes = junk ++ rec(1, "alpha") ++ noise ++ rec(2, "beta") ++ truncated
    val got = Warc.parseAll("f", bytes).toSeq
    assert(got.map(_.payload) == Seq("alpha", "beta"), got)
  }

  test("header names are case-insensitive; payload may contain the marker") {
    val body = "embedded WARC/1.0 marker inside payload"
    val raw = ("warc/ignore" + new String(
      Warc.recordBytes("resource", "urn:doc:9", "u", body.getBytes("UTF-8"))
        .map(_.toChar))).getBytes("ISO-8859-1")
    val lower = new String(raw, "ISO-8859-1")
      .replace("WARC-Record-ID", "warc-record-id")
      .replace("Content-Length", "CONTENT-LENGTH").getBytes("ISO-8859-1")
    val got = Warc.parseAll("f", lower).toSeq
    assert(got.map(_.payload) == Seq(body))
    assert(got.head.record_id == "urn:doc:9")
  }

  test("Warc.read: concatenated gzip members and plain files through the binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val gz = Warc.gzipMember(rec(1, "one")) ++ Warc.gzipMember(rec(2, "two"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.warc.gz"), gz)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.warc"), rec(3, "three"))
    val got = Warc.read(spark, dir).collect()
      .map(r => (r.getAs[String]("record_id"), r.getAs[String]("payload")))
      .sortBy(_._1).toSeq
    assert(got == Seq("urn:doc:1" -> "one", "urn:doc:2" -> "two",
      "urn:doc:3" -> "three"))
  }

  test("inflate enforces the per-file buffer bound") {
    val big = Warc.gzipMember(new Array[Byte](1 << 20))
    intercept[IllegalArgumentException] {
      Warc.inflate(big, maxBytes = 1024)
    }
  }
}
