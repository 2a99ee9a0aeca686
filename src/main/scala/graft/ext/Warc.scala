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
  */
object Warc {

  final case class WarcRecord(
      record_no: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      http_status: Int,        // -1 when the payload is not an HTTP message
      body: Array[Byte])       // HTTP body for response records, else payload

  /** Parse one WARC blob into its records (single forward scan). */
  def parse(blob: Array[Byte]): Seq[WarcRecord] = {
    if (blob == null) return Nil
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
        }
      }
      out += WarcRecord(no, wType, uri, clen,
        status, java.util.Arrays.copyOfRange(blob, bodyStart, payloadEnd))
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
