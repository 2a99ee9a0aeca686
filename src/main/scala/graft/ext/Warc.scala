package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record extraction — the ingestion
  * format of real web crawls (Common Crawl ships WARC). A WARC blob is
  * a concatenation of records, each `WARC/1.x\r\n` + header lines +
  * `\r\n\r\n` + a Content-Length payload + `\r\n\r\n`; response-record
  * payloads are raw HTTP messages whose body starts after the HTTP
  * header block.
  *
  * Scale shape: one blob per row (the natural landing of
  * `spark.read.format("binaryFile")` over a crawl bucket — one ~1 GB
  * WARC file per row/task), parsed in a single forward scan per blob
  * inside `flatMap` — map-only, no shuffle, no driver state; downstream
  * stages ([[graft.functions.HtmlText]], [[TextAnalysis.stripBoilerplate]],
  * dedup) pick up from the exploded records. Malformed input is cut
  * short, never thrown: parsing stops at the first structural violation
  * and returns the records before it.
  *
  * Compression envelope (the format real crawls distribute):
  *   - `.warc.gz` blobs — one gzip MEMBER per record (ISO 28500 annex;
  *     Common Crawl ships exactly this) — are detected by the `1f 8b`
  *     magic and inflated member-by-member with a fresh
  *     `Inflater(nowrap=true)` per member; a truncated or corrupt member
  *     contributes nothing and parsing keeps every record from the
  *     complete members before it.
  *   - HTTP payloads with `Transfer-Encoding: chunked` (how origin
  *     servers stream and how crawlers store them verbatim) are
  *     de-chunked: size-line framing, chunk extensions, and trailing
  *     headers are stripped so chunk metadata never leaks into
  *     extracted text.
  *   - HTTP payloads with `Content-Encoding: gzip` are inflated after
  *     de-chunking (wire order: transfer-coding wraps content-coding);
  *     undecodable bodies fall back to the raw bytes.
  */
object Warc {

  final case class WarcRecord(
      record_no: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      http_status: Int,        // -1 when the payload is not an HTTP message
      body: Array[Byte])       // HTTP body for response records, else payload

  /** Is this blob gzip data (RFC 1952 magic)? */
  private def isGzip(b: Array[Byte], at: Int = 0): Boolean =
    b != null && at + 2 <= b.length &&
      (b(at) & 0xff) == 0x1f && (b(at + 1) & 0xff) == 0x8b

  /** Inflate a concatenation of gzip members (RFC 1952), one fresh
    * `Inflater(nowrap=true)` per member — the `.warc.gz` layout where
    * every record is its own member so readers can split on member
    * boundaries. Damage containment: each member inflates into its own
    * buffer and is appended only on a CLEAN finish, so a truncated or
    * corrupt member (or trailing garbage) contributes zero bytes and
    * every complete member before it survives — the same cut-short
    * contract as the record parser.
    */
  private[ext] def gunzipMembers(blob: Array[Byte]): Array[Byte] = {
    // size HINT, capped: at the ~1 GB-per-row crawl scale an eager
    // blob.length*3 array is a large allocation before any inflation
    // happens (and the multiplication overflows Int past ~715 MB)
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(blob.length.toLong * 3, 16L << 20).toInt))
    val buf = new Array[Byte](64 * 1024)
    var i = 0
    while (isGzip(blob, i)) {
      // --- member header: magic, CM=deflate, FLG, MTIME/XFL/OS, then
      // optional FEXTRA / FNAME / FCOMMENT / FHCRC fields
      if (i + 10 > blob.length) return out.toByteArray
      if ((blob(i + 2) & 0xff) != 8) return out.toByteArray
      val flg = blob(i + 3) & 0xff
      var p = i + 10
      if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
        if (p + 2 > blob.length) return out.toByteArray
        p += 2 + ((blob(p) & 0xff) | ((blob(p + 1) & 0xff) << 8))
      }
      var fields = List.empty[Int]
      if ((flg & 0x08) != 0) fields ::= 0 // FNAME: zero-terminated
      if ((flg & 0x10) != 0) fields ::= 0 // FCOMMENT: zero-terminated
      fields.foreach { _ =>
        while (p < blob.length && blob(p) != 0) p += 1
        p += 1
      }
      if ((flg & 0x02) != 0) p += 2 // FHCRC
      if (p >= blob.length) return out.toByteArray
      // --- raw deflate stream
      val member = new java.io.ByteArrayOutputStream(buf.length)
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(blob, p, blob.length - p)
        var ok = true
        while (ok && !inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => ok = false; 0 }
          if (n > 0) member.write(buf, 0, n)
          else if (!inf.finished() && inf.needsInput()) ok = false // truncated
        }
        if (!ok || !inf.finished()) return out.toByteArray
        val consumed = (blob.length - p) - inf.getRemaining
        // CRC32 + ISIZE trailer must be present AND the CRC must match —
        // deflate can inflate structurally through flipped bits, the CRC
        // is what actually certifies the member
        if (p + consumed + 8 > blob.length) return out.toByteArray
        val bytes = member.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        val t = p + consumed
        val stored = (blob(t) & 0xffL) | ((blob(t + 1) & 0xffL) << 8) |
          ((blob(t + 2) & 0xffL) << 16) | ((blob(t + 3) & 0xffL) << 24)
        if (crc.getValue != stored) return out.toByteArray
        out.write(bytes, 0, bytes.length)
        i = p + consumed + 8
      } finally inf.end()
    }
    out.toByteArray
  }

  /** Decode a `Transfer-Encoding: chunked` HTTP body (RFC 9112 §7.1):
    * hex size line (chunk extensions after `;` ignored) + CRLF + data +
    * CRLF, terminated by a zero chunk whose trailing headers are
    * dropped. Malformed framing cuts short — the chunks decoded so far
    * are returned, chunk metadata never leaks into the body. Returns
    * NULL when the very first size line is not hex at all: that is the
    * signature of a header that CLAIMS chunked over an already-decoded
    * stored body (proxy rewrites), and the caller falls back to the raw
    * bytes rather than erasing the record.
    */
  private[ext] def dechunk(b: Array[Byte], start: Int, end: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, end - start))
    var i = start
    var first = true
    while (true) {
      var j = i
      while (j + 1 < end && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      // no size line at all on the FIRST chunk → not chunked data either
      if (j + 1 >= end) return if (first) null else out.toByteArray
      val line = new String(b, i, j - i, "ISO-8859-1")
      val hex = line.indexOf(';') match {
        case -1 => line.trim
        case k  => line.substring(0, k).trim
      }
      val size =
        try java.lang.Long.parseLong(hex, 16)
        catch {
          case _: NumberFormatException =>
            return if (first) null else out.toByteArray
        }
      first = false
      if (size == 0) return out.toByteArray // trailer section dropped
      val dataStart = j + 2
      val dataEnd = dataStart + size
      if (size < 0 || dataEnd + 2 > end) return out.toByteArray
      out.write(b, dataStart, size.toInt)
      if (!(b(dataEnd.toInt) == '\r' && b(dataEnd.toInt + 1) == '\n'))
        return out.toByteArray
      i = dataEnd.toInt + 2
    }
    out.toByteArray // unreachable
  }

  /** Parse one WARC blob into its records (single forward scan).
    * `.warc.gz` blobs (gzip magic) are inflated member-wise first.
    */
  def parse(blob0: Array[Byte]): Seq[WarcRecord] = {
    if (blob0 == null) return Nil
    // multiply-gzipped blobs unwrap in a LOOP with a depth cap — an
    // adversarial gzip-of-gzip tower must neither recurse (stack death)
    // nor spin (each level is a fresh allocation)
    var blob = blob0
    var depth = 0
    while (isGzip(blob) && depth < 8) { blob = gunzipMembers(blob); depth += 1 }
    if (isGzip(blob)) return Nil // still gzip after the cap: adversarial
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var i = 0
    var no = 0
    def findCrlfCrlf(from: Int, limit: Int): Int = {
      var j = from
      while (j + 3 < limit) {
        if (blob(j) == '\r' && blob(j + 1) == '\n' &&
          blob(j + 2) == '\r' && blob(j + 3) == '\n') return j
        j += 1
      }
      -1
    }
    while (i + 5 <= blob.length &&
      blob(i) == 'W' && blob(i + 1) == 'A' && blob(i + 2) == 'R' &&
      blob(i + 3) == 'C' && blob(i + 4) == '/') {
      val hdrEnd = findCrlfCrlf(i, blob.length)
      if (hdrEnd < 0) return out.toSeq
      val headers = new String(blob, i, hdrEnd - i, "ISO-8859-1")
      var wType = ""; var uri = ""; var clen = -1L
      headers.split("\r\n").foreach { line =>
        val c = line.indexOf(':')
        if (c > 0) {
          val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(c + 1).trim
          k match {
            case "warc-type" => wType = v
            case "warc-target-uri" => uri = v
            case "content-length" =>
              clen = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ =>
          }
        }
      }
      val payloadStart = hdrEnd + 4
      if (clen < 0 || payloadStart + clen > blob.length) return out.toSeq
      val payloadEnd = (payloadStart + clen).toInt
      // HTTP payload? status line + headers + \r\n\r\n + body
      var status = -1
      var bodyStart = payloadStart
      var chunked = false
      var gzipBody = false
      if (clen >= 12 && blob(payloadStart) == 'H' && blob(payloadStart + 1) == 'T' &&
        blob(payloadStart + 2) == 'T' && blob(payloadStart + 3) == 'P') {
        val he = findCrlfCrlf(payloadStart, payloadEnd)
        if (he >= 0) {
          bodyStart = he + 4
          val line = new String(blob, payloadStart,
            math.min(64, payloadEnd - payloadStart), "ISO-8859-1")
          val parts = line.split(" ")
          if (parts.length >= 2)
            status = try parts(1).takeWhile(_.isDigit) match {
              case "" => -1
              case ds => ds.toInt
            } catch { case _: NumberFormatException => -1 }
          // transfer/content codings from the stored response headers
          new String(blob, payloadStart, he - payloadStart, "ISO-8859-1")
            .split("\r\n").foreach { h =>
              val c = h.indexOf(':')
              if (c > 0) {
                val k = h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
                val v = h.substring(c + 1).trim.toLowerCase(java.util.Locale.ROOT)
                if (k == "transfer-encoding" && v.contains("chunked")) chunked = true
                if (k == "content-encoding" && v.contains("gzip")) gzipBody = true
              }
            }
        }
      }
      // wire order unwinds transfer-coding first, then content-coding;
      // an undecodable gzip body falls back to its raw bytes (cut-short
      // contract — ingestion must never throw on one stored response)
      val rawBody =
        if (chunked) {
          // same fallback contract as the gzip body path: a header that
          // CLAIMS chunked over an already-dechunked stored body (proxy
          // rewrites — dechunk signals it with null) must not erase the
          // record; fall back to the raw bytes
          val dechunked = dechunk(blob, bodyStart, payloadEnd)
          if (dechunked == null)
            java.util.Arrays.copyOfRange(blob, bodyStart, payloadEnd)
          else dechunked
        } else java.util.Arrays.copyOfRange(blob, bodyStart, payloadEnd)
      val body =
        if (gzipBody && isGzip(rawBody)) {
          val inflated = gunzipMembers(rawBody)
          if (inflated.nonEmpty) inflated else rawBody
        } else rawBody
      out += WarcRecord(no, wType, uri, clen, status, body)
      no += 1
      // each record payload is followed by two CRLFs
      i = payloadEnd
      while (i + 1 < blob.length && blob(i) == '\r' && blob(i + 1) == '\n') i += 2
    }
    out.toSeq
  }

  /** Explode a DataFrame of WARC blobs into records:
    * (id, record_no, warc_type, target_uri, content_length, http_status,
    * body). One flatMap, map-only at any corpus size.
    */
  def records(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) => parse(blob).map(r =>
        (id, r.record_no, r.warc_type, r.target_uri, r.content_length,
          r.http_status, r.body)) }
      .toDF(idCol, "record_no", "warc_type", "target_uri",
        "content_length", "http_status", "body")
  }
}
