package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal WARC (Web ARChive, ISO 28500 — the Common Crawl container)
  * reader/writer: the ingest format every web-scale text pipeline
  * starts from. A WARC file is a concatenation of records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: http://…\r\n
  * Content-Length: N\r\n          (N in OCTETS — bytes, not chars)
  * \r\n
  * <N-byte block>\r\n\r\n
  * }}}
  *
  * For `response` records whose block is an HTTP response
  * (`Content-Type: application/http`), the HTTP status line + headers
  * are stripped at the first CRLF-CRLF and the payload is the HTTP
  * body — what [[MainContent]] and the text surface then consume.
  *
  * Scale shape: WARC members are parsed per-blob, map-side (the
  * industry convention — Common Crawl gzips each record as its own
  * member, so files split at record boundaries and a task owns whole
  * records). Parsing is one linear byte scan per blob; the engine op
  * is a flatMap-style posexplode with no shuffle. Content-Length is
  * honored in BYTES on the raw buffer (multi-byte UTF-8 text would
  * desync a char-indexed parser).
  *
  * Malformed input contract: a record whose header block or declared
  * length overruns the buffer terminates the scan and returns the
  * records parsed so far (a truncated tail must not kill the task —
  * the [[HtmlIngest]] batch-parse convention); gibberish between
  * records is skipped by resynchronizing on the next "WARC/" magic.
  */
object Warc {

  final case class WarcRecord(warcType: String, recordId: String,
                              targetUri: String, httpStatus: Option[Int],
                              payload: Array[Byte]) {
    def payloadText: String = new String(payload, StandardCharsets.UTF_8)
  }

  private val Magic = "WARC/".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val CrlfCrlf = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Inflate a `.warc.gz` blob — a CHAIN of gzip members, one per
    * record (the Common Crawl convention this file's header cites:
    * per-record members are what let a 100 TB crawl split at record
    * boundaries, because a task can start inflating at any member
    * offset). JDK `GZIPInputStream` consumes concatenated members
    * natively (after each member's trailer it probes for the next
    * header), so one stream yields the whole chain.
    *
    * Contract mirrors [[parse]]'s malformed-input rule: a TRUNCATED
    * member (EOF mid-deflate, bad CRC) returns the bytes inflated so
    * far — the intact prefix records still parse, the cut tail is
    * dropped by [[parse]]'s own overrun check. A blob that does not
    * start with the gzip magic (0x1f 0x8b) passes through unchanged,
    * so [[records]] reads plain and gzipped WARC files with one code
    * path. Null/empty → empty.
    */
  def inflate(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.empty
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes // not gzip — plain WARC passthrough
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), buf.length)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case _: java.io.IOException => // truncated/corrupt member → keep prefix
    }
    out.toByteArray
  }

  /** Gzip one record (or any byte run) as its OWN member — the writer
    * half of the per-record member chain convention. Concatenating the
    * results of per-record calls yields a valid `.warc.gz` blob that
    * [[inflate]] (and any standard gunzip) consumes whole.
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record)
    gz.close()
    bos.toByteArray
  }

  /** Parse every record in a WARC blob (one file / one gzip member
    * chain, already decompressed). Null/empty → no records.
    */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] = {
    if (bytes == null || bytes.isEmpty) return Vector.empty
    val out = Vector.newBuilder[WarcRecord]
    var pos = indexOf(bytes, Magic, 0)
    while (pos >= 0) {
      val hdrEnd = indexOf(bytes, CrlfCrlf, pos)
      if (hdrEnd < 0) return out.result() // truncated header → stop
      // WARC headers are ASCII by spec (ISO 28500 §4)
      val header = new String(bytes, pos, hdrEnd - pos, StandardCharsets.US_ASCII)
      val fields = header.split("\r\n").iterator.drop(1) // drop version line
        .map(_.split(":", 2))
        .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
        .toMap
      val len = fields.get("content-length").flatMap(_.toLongOption)
      len match {
        case Some(n) if hdrEnd + 4 + n <= bytes.length =>
          val blockStart = hdrEnd + 4
          val block = java.util.Arrays.copyOfRange(
            bytes, blockStart, blockStart + n.toInt)
          val warcType = fields.getOrElse("warc-type", "")
          val isHttp = warcType == "response" &&
            fields.get("content-type").exists(_.startsWith("application/http"))
          val (status, payload) =
            if (isHttp) {
              val split = indexOf(block, CrlfCrlf, 0)
              if (split < 0) (None, block) // headerless HTTP — keep whole block
              else {
                val statusLine = new String(block, 0,
                  math.min(split, block.length), StandardCharsets.US_ASCII)
                  .split("\r\n")(0)
                val st = statusLine.split("\\s+").lift(1).flatMap(_.toIntOption)
                (st, java.util.Arrays.copyOfRange(block, split + 4, block.length))
              }
            } else (None, block)
          out += WarcRecord(warcType,
            fields.getOrElse("warc-record-id", ""),
            fields.getOrElse("warc-target-uri", ""), status, payload)
          pos = indexOf(bytes, Magic, blockStart + n.toInt)
        case Some(_) => return out.result() // declared length overruns → stop
        case None => pos = indexOf(bytes, Magic, hdrEnd + 4) // resync
      }
    }
    out.result()
  }

  /** Serialize one record (the spec/fixture writer and the synthesis
    * path — byte-exact round trip with [[parse]]).
    */
  def writeRecord(warcType: String, recordId: String, targetUri: String,
                  block: Array[Byte],
                  contentType: Option[String] = None): Array[Byte] = {
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $warcType\r\n")
      .append(s"WARC-Record-ID: $recordId\r\n")
      .append(s"WARC-Target-URI: $targetUri\r\n")
    contentType.foreach(ct => hdr.append(s"Content-Type: $ct\r\n"))
    hdr.append(s"Content-Length: ${block.length}\r\n\r\n")
    hdr.toString.getBytes(StandardCharsets.US_ASCII) ++ block ++
      "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  }

  /** An HTTP-response record wrapping `body` (the Common Crawl shape). */
  def writeHttpResponse(recordId: String, targetUri: String,
                        body: Array[Byte], status: Int = 200): Array[Byte] = {
    val http = (s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII) ++ body
    writeRecord("response", recordId, targetUri, http,
      contentType = Some("application/http; msgtype=response"))
  }

  /** DataFrame op: explode a binary WARC-blob column into one row per
    * record — (warc_type, record_id, target_uri, http_status,
    * payload_text) columns added, other columns carried. Map-side
    * only (posexplode of a per-row parse; no shuffle). Gzipped blobs
    * ([[inflate]]'s magic check) are member-chain-inflated in the same
    * per-row pass, so `.warc` and `.warc.gz` files read identically.
    */
  def records(df: DataFrame, blobCol: String): DataFrame = {
    val parseUdf = udf((blob: Array[Byte]) =>
      parse(inflate(blob)).map(r => (r.warcType, r.recordId, r.targetUri,
        r.httpStatus, r.payloadText)))
    df.withColumn("__recs", parseUdf(col(blobCol)))
      .withColumn("__r", explode(col("__recs")))
      .drop("__recs", blobCol)
      .withColumn("warc_type", col("__r._1"))
      .withColumn("record_id", col("__r._2"))
      .withColumn("target_uri", col("__r._3"))
      .withColumn("http_status", col("__r._4"))
      .withColumn("payload_text", col("__r._5"))
      .drop("__r")
  }
}
