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
