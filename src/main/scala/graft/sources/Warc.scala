package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One parsed WARC record (header fields the curation path uses, plus
  * the payload decoded as UTF-8 text — crawl text processing operates
  * on strings; binary payloads survive byte-for-byte only when valid
  * UTF-8, which is the documented trade of this text-pipeline reader). */
case class WarcRecord(file: String, warc_type: String, record_id: String,
                      target_uri: String, warc_date: String,
                      content_type: String, content_length: Long,
                      payload: String)

/** Minimal WARC (ISO 28500, "WARC/1.x") reader — the crawl-corpus front
  * door: web archives (e.g. Common Crawl segments) ship as `.warc.gz`,
  * not parquet.
  *
  * Record layout: `WARC/1.x CRLF`, `Name: value` header lines, a blank
  * line, `Content-Length` payload bytes, then two CRLFs. Gzip segment
  * files are usually one gzip MEMBER per record, concatenated — JDK
  * GZIPInputStream reads concatenated members transparently, so the
  * whole file inflates in one pass.
  *
  * Robustness contract (lenient scan): records are located by searching
  * for the `WARC/1.` version marker; a record whose headers don't parse
  * or whose `Content-Length` is missing/overruns the buffer is SKIPPED
  * and scanning resyncs at the next marker — a truncated tail or
  * garbage between records costs those bytes, never the file.
  *
  * Scale shape: parallelism is per FILE (`binaryFile` source) — a
  * `.warc.gz` is not splittable, which matches how crawl pipelines
  * parallelize (thousands of ~1 GB segment files, one task each).
  * `maxFileBytes` bounds the per-task inflate buffer; size it to
  * executor memory, and keep segment files at crawl-standard sizes. */
object Warc {

  /** Read all WARC records under `path` (a file, directory, or glob of
    * `.warc` / `.warc.gz`). Columns: file, warc_type, record_id,
    * target_uri, warc_date, content_type, content_length, payload. */
  def read(spark: SparkSession, path: String,
           // default just under Int.MaxValue: the inflate buffer is a
           // JVM byte array (Int-indexed), so a larger bound could
           // never fire — the array growth would OOM first with an
           // opaque error instead of this guard's split-the-file advice
           maxFileBytes: Long = Int.MaxValue - 16L): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, raw) =>
        val bytes = inflate(raw, maxFileBytes)
        parseAll(file, bytes)
      }.toDF()
  }

  /** Gunzip when the magic matches (concatenated members included),
    * else pass through. */
  private[graft] def inflate(raw: Array[Byte], maxBytes: Long): Array[Byte] =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      // sizing hint only — clamp the Long product: raw.length * 4 as a
      // bare Int multiply wraps negative past 512 MiB of gz input and
      // the constructor throws before a byte is inflated
      val out = new java.io.ByteArrayOutputStream(
        math.min(raw.length.toLong * 4, Int.MaxValue - 16L).toInt)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > maxBytes) throw new IllegalArgumentException(
          s"WARC file inflates past maxFileBytes=$maxBytes — " +
            "raise the bound or split the segment file")
        n = in.read(buf)
      }
      out.toByteArray
    } else raw

  private val Marker = "WARC/1.".getBytes("US-ASCII")

  private def bytesIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Lenient sequential parse: marker scan → header block → payload by
    * Content-Length; malformed candidates skip to the next marker. */
  private[graft] def parseAll(file: String,
                              data: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = null
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos < data.length) {
          val at = bytesIndexOf(data, Marker, pos)
          if (at < 0) { pos = data.length; return }
          tryParse(at) match {
            case Some((rec, end)) => nextRec = rec; pos = end
            case None => pos = at + Marker.length // resync past this marker
          }
        }
      }
      private def tryParse(at: Int): Option[(WarcRecord, Int)] = {
        // header block ends at the first blank line (CRLFCRLF, LF-lenient)
        var i = at
        val headers = collection.mutable.Map.empty[String, String]
        var version = true
        var ok = true
        var done = false
        while (!done && ok) {
          val eol = bytesIndexOf(data, Array[Byte](10.toByte), i)
          if (eol < 0 || eol - i > 65536) ok = false
          else {
            val line = new String(data, i, eol - i, "UTF-8").stripSuffix("\r")
            i = eol + 1
            if (line.isEmpty) done = true
            else if (version) version = false // the WARC/1.x line itself
            else line.indexOf(':') match {
              case c if c > 0 =>
                headers(line.substring(0, c).trim.toLowerCase) =
                  line.substring(c + 1).trim
              case _ => ok = false
            }
          }
        }
        val len = headers.get("content-length").flatMap(_.toLongOption)
        if (!ok || len.isEmpty || len.get < 0 || i + len.get > data.length)
          None
        else {
          val l = len.get.toInt
          Some((WarcRecord(file,
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-record-id", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("content-type", ""),
            l.toLong, new String(data, i, l, "UTF-8")), i + l))
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Serialize one record (test/fixture writer — the read direction is
    * the product; this keeps round-trip gates self-contained). */
  def recordBytes(warcType: String, recordId: String, targetUri: String,
                  payload: Array[Byte],
                  contentType: String = "text/plain"): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $warcType\r\n"
    h ++= s"WARC-Record-ID: $recordId\r\n"
    if (targetUri.nonEmpty) h ++= s"WARC-Target-URI: $targetUri\r\n"
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n\r\n"
    val head = h.toString.getBytes("UTF-8")
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Gzip one member (concatenate members for a standard `.warc.gz`). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }
}
