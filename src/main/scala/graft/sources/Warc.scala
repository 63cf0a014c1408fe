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

  /** Header text (version line included) → field map. WARC headers are
    * ASCII by spec (ISO 28500 §4).
    */
  private def headerFields(header: String): Map[String, String] =
    header.split("\r\n").iterator.drop(1) // drop version line
      .map(_.split(":", 2))
      .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
      .toMap

  /** Fields + raw block → record: the HTTP-response strip (status line
    * + headers cut at the first CRLF-CRLF) shared by the blob parser
    * and the streaming iterator, so the two paths can never disagree
    * about what a record IS.
    */
  private def buildRecord(fields: Map[String, String],
                          block: Array[Byte]): WarcRecord = {
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
    WarcRecord(warcType, fields.getOrElse("warc-record-id", ""),
      fields.getOrElse("warc-target-uri", ""), status, payload)
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
      val fields = headerFields(
        new String(bytes, pos, hdrEnd - pos, StandardCharsets.US_ASCII))
      val len = fields.get("content-length").flatMap(_.toLongOption)
      len match {
        case Some(n) if hdrEnd + 4 + n <= bytes.length =>
          val blockStart = hdrEnd + 4
          val block = java.util.Arrays.copyOfRange(
            bytes, blockStart, blockStart + n.toInt)
          out += buildRecord(fields, block)
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

  /** Default per-record size cap for the streaming reader: a record
    * whose declared Content-Length exceeds this is SKIPPED (its block
    * read-and-discarded in 64 KB chunks, never materialized) — the
    * bound that keeps one pathological record from OOMing a task.
    * Common Crawl truncates response payloads at 1 MiB; 256 MiB leaves
    * three orders of magnitude of headroom while staying far under any
    * executor's task share.
    */
  val MaxRecordBytes: Long = 256L * 1024 * 1024

  /** Incremental record parser over a RAW byte stream — the
    * file-granular reader: O(record) memory regardless of file size,
    * where [[parse]]+[[inflate]] need the whole decompressed chain as
    * one array (JVM cap 2 GB — under a real ~1 GB-compressed /
    * ~4-5 GB-decompressed crawl segment). Gzip member chains are
    * detected by magic and inflated through the SAME streaming pass
    * (JDK GZIPInputStream consumes concatenated members natively), so
    * `.warc` and `.warc.gz` streams read identically.
    *
    * Malformed-input contract mirrors [[parse]] exactly, restated for
    * a stream: EOF mid-header or mid-block (the truncated tail — also
    * what a cut gzip member surfaces as) ends iteration keeping the
    * records parsed so far; gibberish between records is skipped by
    * scanning to the next "WARC/" magic; a record with no parseable
    * Content-Length resyncs after its header. Additions only a stream
    * needs: a header that runs past 64 KiB without its CRLF-CRLF is
    * treated as gibberish (resync), and a block longer than
    * `maxRecordBytes` is skipped without materializing (cap above).
    *
    * The caller owns closing `raw`; iteration never reads past what it
    * needs (plus the inflater's 64 KB readahead), so records stream
    * off a network/object-store handle at O(record) memory.
    */
  def recordIterator(raw: java.io.InputStream,
                     maxRecordBytes: Long = MaxRecordBytes): Iterator[WarcRecord] = {
    val MaxHeaderBytes = 64 * 1024
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(raw, 64 * 1024), 2)
    val h1 = pb.read()
    val h2 = if (h1 < 0) -1 else pb.read()
    if (h2 >= 0) pb.unread(h2)
    if (h1 >= 0) pb.unread(h1)
    val in: java.io.InputStream =
      if (h1 == 0x1f && h2 == 0x8b)
        new java.util.zip.GZIPInputStream(pb, 64 * 1024)
      else pb

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false

      // scan to just past the "WARC/" magic; false at EOF. A stream
      // IOException anywhere (truncated/corrupt gzip member) reads as
      // EOF: keep the prefix, drop the cut tail — the inflate contract.
      private def readByte(): Int =
        try in.read() catch { case _: java.io.IOException => -1 }

      private def scanToMagic(): Boolean = {
        var m = 0
        while (m < Magic.length) {
          val b = readByte()
          if (b < 0) return false
          m = if (b == Magic(m)) m + 1
              else if (b == Magic(0)) 1
              else 0
        }
        true
      }

      // header bytes AFTER the magic, up to and including CRLF-CRLF;
      // null at EOF or past the header cap (caller resyncs)
      private def readHeaderTail(): Array[Byte] = {
        val buf = new java.io.ByteArrayOutputStream(512)
        var tail = 0L // rolling CRLFCRLF matcher packed into a long
        while (buf.size < MaxHeaderBytes) {
          val b = readByte()
          if (b < 0) return null
          buf.write(b)
          tail = ((tail << 8) | b) & 0xffffffffL
          if (tail == 0x0d0a0d0aL) return buf.toByteArray
        }
        null
      }

      private def readFully(n: Long): Array[Byte] = {
        val out = new Array[Byte](n.toInt)
        var off = 0
        while (off < n) {
          val r = try in.read(out, off, n.toInt - off)
                  catch { case _: java.io.IOException => -1 }
          if (r < 0) return null // truncated block → drop the tail
          off += r
        }
        out
      }

      private def discard(n: Long): Boolean = {
        val buf = new Array[Byte](64 * 1024)
        var left = n
        while (left > 0) {
          val r = try in.read(buf, 0, math.min(left, buf.length).toInt)
                  catch { case _: java.io.IOException => -1 }
          if (r < 0) return false
          left -= r
        }
        true
      }

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          if (!scanToMagic()) { done = true; return }
          val hdr = readHeaderTail()
          if (hdr == null) {
            // EOF mid-header ends on the next scan; header-cap overrun
            // already consumed the garbage — loop resyncs on the magic
          } else {
            val fields = headerFields("WARC/" +
              new String(hdr, 0, hdr.length - 4, StandardCharsets.US_ASCII))
            // JVM arrays cap near 2^31 — a maxRecordBytes above that
            // still must route big declared lengths to the skip path
            val effMax = math.min(maxRecordBytes, Int.MaxValue - 8L)
            fields.get("content-length").flatMap(_.toLongOption) match {
              case Some(n) if n >= 0 && n <= effMax =>
                val block = readFully(n)
                if (block == null) done = true // truncated tail → stop
                else nextRec = buildRecord(fields, block)
              case Some(n) if n >= 0 => // oversized: skip, don't materialize
                if (!discard(n)) done = true
              case _ => // unparseable length → resync after header
            }
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("end of WARC stream")
        val r = nextRec
        nextRec = null
        r
      }
    }
  }

  /** Hadoop Configuration is not Serializable; ship it to tasks via its
    * own Writable protocol (the standard Spark-source pattern).
    */
  private final class SerializableHadoopConf(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
      extends java.io.Serializable {
    def get: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** File-granular streamed WARC ingest — the at-scale reader: a frame
    * of FILE PATHS (not blobs) explodes into one row per record, each
    * task streaming its files record-by-record through
    * [[recordIterator]] over an FSDataInputStream. Peak task memory is
    * O(largest record), not O(file): a standard ~1 GB-compressed /
    * ~4-5 GB-decompressed Common Crawl segment — over the JVM's 2 GB
    * single-array cap that bounds the [[records]] blob-column path —
    * streams through unchanged. Parallelism is the path frame's
    * partitioning (one crawl segment per task is the Common Crawl
    * convention; `paths.repartition(n)` to spread).
    *
    * Output: (file, warc_type, record_id, target_uri, http_status,
    * payload_text) — the [[records]] columns plus the source file, so
    * the two ingest forms compose with the same downstream funnel.
    */
  def recordsFromFiles(paths: DataFrame, pathCol: String = "path",
                       maxRecordBytes: Long = MaxRecordBytes): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    paths.select(col(pathCol).cast("string")).as[String]
      .mapPartitions { it =>
        val conf = confBc.value.get
        it.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          val raw = fs.open(path)
          // release the handle when the task finishes, even if the
          // downstream consumer stops early (limit, failure)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => raw.close()))
          recordIterator(raw, maxRecordBytes).map(r =>
            (p, r.warcType, r.recordId, r.targetUri, r.httpStatus,
              r.payloadText))
        }
      }
      .toDF("file", "warc_type", "record_id", "target_uri", "http_status",
        "payload_text")
  }
}
