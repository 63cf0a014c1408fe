package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private def blob(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  test("write → parse round trip: multi-record blob, payloads byte-exact") {
    val b = blob(
      Warc.writeHttpResponse("<urn:uuid:1>", "http://a.example/1",
        "<html><p>first page</p></html>".getBytes(UTF_8)),
      Warc.writeRecord("warcinfo", "<urn:uuid:info>", "",
        "software: graft".getBytes(UTF_8)),
      Warc.writeHttpResponse("<urn:uuid:2>", "http://a.example/2",
        "second body".getBytes(UTF_8), status = 404))
    val rs = Warc.parse(b)
    assert(rs.map(_.warcType) == Vector("response", "warcinfo", "response"))
    assert(rs(0).payloadText == "<html><p>first page</p></html>")
    assert(rs(0).httpStatus.contains(200))
    assert(rs(1).payloadText == "software: graft" && rs(1).httpStatus.isEmpty)
    assert(rs(2).httpStatus.contains(404) && rs(2).targetUri == "http://a.example/2")
  }

  test("Content-Length is honored in BYTES: multi-byte UTF-8 body does not desync the scan") {
    // 'naïve…' is 6 code points / 9 UTF-8 bytes; a char-indexed parser
    // would overrun into the next record
    val b = blob(
      Warc.writeHttpResponse("<urn:uuid:1>", "http://u.example/1",
        "naïve…".getBytes(UTF_8)),
      Warc.writeHttpResponse("<urn:uuid:2>", "http://u.example/2",
        "plain ascii".getBytes(UTF_8)))
    val rs = Warc.parse(b)
    assert(rs.size == 2, rs.map(_.targetUri))
    assert(rs(0).payloadText == "naïve…")
    assert(rs(1).payloadText == "plain ascii")
  }

  test("truncated tail stops cleanly; gibberish between records resyncs on the magic") {
    val whole = Warc.writeHttpResponse("<urn:uuid:1>", "http://t.example/1",
      "kept record".getBytes(UTF_8))
    val junk = "NOT A RECORD\r\n\r\n".getBytes(UTF_8)
    val truncated = Warc.writeHttpResponse("<urn:uuid:2>", "http://t.example/2",
      "this body is cut".getBytes(UTF_8)).dropRight(12)
    val rs = Warc.parse(blob(junk, whole, junk, truncated))
    assert(rs.map(_.targetUri) == Vector("http://t.example/1"),
      s"exactly the intact record survives: $rs")
    assert(Warc.parse(null) == Vector.empty && Warc.parse(Array.empty) == Vector.empty)
  }

  test("records(): map-side explode over a blob column, no shuffle") {
    import spark.implicits._
    val b1 = blob(
      Warc.writeHttpResponse("<urn:uuid:1>", "http://d.example/1", "one".getBytes(UTF_8)),
      Warc.writeHttpResponse("<urn:uuid:2>", "http://d.example/2", "two".getBytes(UTF_8)))
    val b2 = Warc.writeHttpResponse("<urn:uuid:3>", "http://d.example/3", "three".getBytes(UTF_8))
    val df = Seq(("f1", b1), ("f2", b2)).toDF("file", "blob")
    val out = Warc.records(df, "blob").orderBy("target_uri")
    val got = out.select("file", "target_uri", "http_status", "payload_text")
      .as[(String, String, Option[Int], String)].collect().toSeq
    assert(got == Seq(
      ("f1", "http://d.example/1", Some(200), "one"),
      ("f1", "http://d.example/2", Some(200), "two"),
      ("f2", "http://d.example/3", Some(200), "three")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"record parse must not shuffle (only the test's orderBy may):\n$plan")
  }

  test("inflate: multi-member gzip chain round-trips byte-exact") {
    val r1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://g.example/1",
      "first gzipped body".getBytes(UTF_8))
    val r2 = Warc.writeRecord("warcinfo", "<urn:uuid:info>", "",
      "software: graft".getBytes(UTF_8))
    val r3 = Warc.writeHttpResponse("<urn:uuid:3>", "http://g.example/3",
      "naïve… multi-byte".getBytes(UTF_8), status = 404)
    // one gzip member per record — the Common Crawl .warc.gz convention
    val gz = blob(Warc.gzipMember(r1), Warc.gzipMember(r2), Warc.gzipMember(r3))
    assert(Warc.inflate(gz).toSeq == blob(r1, r2, r3).toSeq,
      "member-chain inflation must reproduce the concatenated records byte-exact")
    val rs = Warc.parse(Warc.inflate(gz))
    assert(rs.map(_.warcType) == Vector("response", "warcinfo", "response"))
    assert(rs(2).payloadText == "naïve… multi-byte" && rs(2).httpStatus.contains(404))
  }

  test("inflate: truncated member keeps the intact prefix records") {
    val r1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://tr.example/1",
      "survives".getBytes(UTF_8))
    val r2 = Warc.writeHttpResponse("<urn:uuid:2>", "http://tr.example/2",
      "this member is cut mid-deflate".getBytes(UTF_8))
    val m2 = Warc.gzipMember(r2)
    val gz = blob(Warc.gzipMember(r1), m2.dropRight(m2.length / 2))
    val rs = Warc.parse(Warc.inflate(gz))
    assert(rs.map(_.targetUri) == Vector("http://tr.example/1"),
      s"exactly the intact first member's record survives: ${rs.map(_.targetUri)}")
  }

  test("inflate: non-gzip blob passes through unchanged; null/empty → empty") {
    val plain = Warc.writeHttpResponse("<urn:uuid:1>", "http://p.example/1",
      "plain warc".getBytes(UTF_8))
    assert(Warc.inflate(plain) eq plain, "plain WARC must pass through without copy")
    assert(Warc.inflate(null).isEmpty && Warc.inflate(Array.empty).isEmpty)
    // single 0x1f byte: too short for the magic check, passes through
    val oneByte = Array(0x1f.toByte)
    assert(Warc.inflate(oneByte).toSeq == oneByte.toSeq)
  }

  // ---- file-granular streaming reader ----

  /** Counts raw bytes handed downstream — the instrument that proves
    * the streaming reader consumes the file INCREMENTALLY (per record)
    * rather than materializing it.
    */
  private final class CountingStream(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes) {
    var consumed: Long = 0
    override def read(): Int = {
      val b = super.read(); if (b >= 0) consumed += 1; b
    }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(buf, off, len); if (n > 0) consumed += n; n
    }
  }

  /** LCG-derived printable bytes — noisy enough that each gzip
    * member's compressed size stays proportional to its record's.
    */
  private def noisyBody(seed: Int, n: Int = 5000): Array[Byte] =
    Array.tabulate(n) { i =>
      val x = (seed * 2654435761L + i.toLong * i * 40503L + (i >> 3) * 97L) >>> 13
      (33 + (x % 94)).toByte
    }

  test("recordIterator: gz member chain parity with parse(inflate(_))") {
    val recs = (1 to 20).map(i => Warc.writeHttpResponse(s"<urn:uuid:$i>",
      s"http://s.example/$i", noisyBody(i), status = if (i % 7 == 0) 404 else 200))
    val gz = blob(recs.map(Warc.gzipMember): _*)
    val streamed = Warc.recordIterator(new java.io.ByteArrayInputStream(gz)).toVector
    val batch = Warc.parse(Warc.inflate(gz))
    assert(streamed.map(r => (r.warcType, r.recordId, r.targetUri, r.httpStatus)) ==
      batch.map(r => (r.warcType, r.recordId, r.targetUri, r.httpStatus)))
    assert(streamed.zip(batch).forall { case (a, b) =>
      java.util.Arrays.equals(a.payload, b.payload) },
      "payloads must be byte-identical between the streamed and blob paths")
  }

  test("recordIterator consumes the stream per-record, not whole-file (O(record) memory)") {
    // 200 × 50 KB noisy records — multi-MB compressed, so the 128 KB
    // of legitimate buffer readahead is noise; if the reader
    // materialized the file (the 2 GB-cap failure mode), the first
    // next() would consume ~everything
    val recs = (1 to 200).map(i => Warc.writeHttpResponse(s"<urn:uuid:$i>",
      s"http://big.example/$i", noisyBody(i, n = 50000)))
    val gz = blob(recs.map(Warc.gzipMember): _*)
    val counting = new CountingStream(gz)
    val it = Warc.recordIterator(counting)
    val slackBytes = 160 * 1024 // Buffered(64K) + GZIP(64K) readahead + header
    var k = 0
    val perRecCompressed = gz.length / 200
    while (k < 50) {
      assert(it.hasNext); it.next(); k += 1
      assert(counting.consumed <= k.toLong * (perRecCompressed + 1024) + slackBytes,
        s"after $k of 200 records the reader consumed ${counting.consumed} " +
          s"of ${gz.length} raw bytes — that is whole-file, not streaming")
    }
    assert(counting.consumed < gz.length / 2,
      "50/200 records must not have consumed half the file")
    assert(it.size == 150, "the remaining records still parse")
  }

  test("recordIterator malformed contract: truncation, gibberish resync, header-cap resync") {
    val keep1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://mf.example/1", "one".getBytes(UTF_8))
    val keep2 = Warc.writeHttpResponse("<urn:uuid:2>", "http://mf.example/2", "two".getBytes(UTF_8))
    val cut = Warc.writeHttpResponse("<urn:uuid:3>", "http://mf.example/3",
      "this tail is cut".getBytes(UTF_8)).dropRight(10)
    val junk = "NOT A RECORD\r\n\r\n".getBytes(UTF_8)
    // a stray magic with 70 KB of headerless garbage exercises the cap
    val capJunk = "WARC/".getBytes(UTF_8) ++ Array.fill(70 * 1024)('x'.toByte)
    val plain = blob(junk, keep1, capJunk, keep2, junk, cut)
    val got = Warc.recordIterator(new java.io.ByteArrayInputStream(plain)).toVector
    assert(got.map(_.targetUri) == Vector("http://mf.example/1", "http://mf.example/2"),
      s"intact records survive junk + header-cap overrun + truncated tail: ${got.map(_.targetUri)}")
  }

  test("recordIterator: oversized declared record is skipped without materializing") {
    val small1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://cap.example/1", "a".getBytes(UTF_8))
    val big = Warc.writeHttpResponse("<urn:uuid:2>", "http://cap.example/2", noisyBody(9))
    val small2 = Warc.writeHttpResponse("<urn:uuid:3>", "http://cap.example/3", "b".getBytes(UTF_8))
    val got = Warc.recordIterator(new java.io.ByteArrayInputStream(blob(small1, big, small2)),
      maxRecordBytes = 1024).toVector
    assert(got.map(_.targetUri) == Vector("http://cap.example/1", "http://cap.example/3"),
      s"the 5 KB record must be skipped under a 1 KB cap, its neighbors kept: ${got.map(_.targetUri)}")
  }

  test("recordsFromFiles: .warc.gz and plain .warc files match the blob path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_files_spec")
    val r1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://f.example/1", "one".getBytes(UTF_8))
    val r2 = Warc.writeHttpResponse("<urn:uuid:2>", "http://f.example/2", "naïve…".getBytes(UTF_8))
    val r3 = Warc.writeHttpResponse("<urn:uuid:3>", "http://f.example/3", "three".getBytes(UTF_8))
    val gzPath = dir.resolve("a.warc.gz")
    val plainPath = dir.resolve("b.warc")
    java.nio.file.Files.write(gzPath, blob(Warc.gzipMember(r1), Warc.gzipMember(r2)))
    java.nio.file.Files.write(plainPath, r3)
    val paths = Seq(gzPath.toString, plainPath.toString).toDF("path")
    val fromFiles = Warc.recordsFromFiles(paths).orderBy("target_uri")
      .select("target_uri", "http_status", "payload_text")
      .as[(String, Option[Int], String)].collect().toSeq
    val blobs = Seq(("a", blob(Warc.gzipMember(r1), Warc.gzipMember(r2))), ("b", r3))
      .toDF("file", "blob")
    val fromBlobs = Warc.records(blobs, "blob").orderBy("target_uri")
      .select("target_uri", "http_status", "payload_text")
      .as[(String, Option[Int], String)].collect().toSeq
    assert(fromFiles == fromBlobs, "file-granular and blob-column reads must agree")
    assert(fromFiles.map(_._3) == Seq("one", "naïve…", "three"))
  }

  test("records() consumes gzipped and plain blobs through one code path") {
    import spark.implicits._
    val r1 = Warc.writeHttpResponse("<urn:uuid:1>", "http://m.example/1", "one".getBytes(UTF_8))
    val r2 = Warc.writeHttpResponse("<urn:uuid:2>", "http://m.example/2", "two".getBytes(UTF_8))
    val gzBlob = blob(Warc.gzipMember(r1), Warc.gzipMember(r2))
    val plainBlob = Warc.writeHttpResponse("<urn:uuid:3>", "http://m.example/3", "three".getBytes(UTF_8))
    val df = Seq(("gz", gzBlob), ("plain", plainBlob)).toDF("file", "blob")
    val got = Warc.records(df, "blob").orderBy("target_uri")
      .select("file", "target_uri", "payload_text")
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(
      ("gz", "http://m.example/1", "one"),
      ("gz", "http://m.example/2", "two"),
      ("plain", "http://m.example/3", "three")))
  }
}
