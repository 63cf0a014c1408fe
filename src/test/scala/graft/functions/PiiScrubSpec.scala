package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(PiiScrub.scrub(col("t"))).collect()(0).getString(0)
  }

  test("emails, phones, IPs, cards are redacted; prose survives") {
    val got = scrubOne(
      "Mail jane.doe+x@sub.example.org or call +44 (0)20 7946-0958. " +
        "Server 10.0.42.17 and fe80::1ff:fe23:4567:890a; card 4111 1111 1111 1111. " +
        "Born in 1996, 3.14 is pi.")
    assert(got.contains("<EMAIL>") && !got.contains("example.org"))
    assert(got.contains("<PHONE>") && !got.contains("7946"))
    assert(got.contains("<IP>") && !got.contains("10.0.42.17") && !got.contains("fe80"))
    assert(got.contains("<CARD>") && !got.contains("4111"))
    // short digit runs in prose are untouched
    assert(got.contains("1996") && got.contains("3.14"))
  }

  test("scrub order: cards and IPs are not half-eaten by the phone pattern") {
    val got = scrubOne("pay 4111-1111-1111-1111 via 192.168.0.1 now")
    assert(got == "pay <CARD> via <IP> now", got)
  }

  test("calendar dates, year ranges and versions survive; dense phones don't") {
    val got = scrubOne(
      "Released 2026-08-12 (build 12/31/2024), supported 2010 - 2019, " +
        "v1.2.3 only. Call 555.010.0042 or +1 (555) 010-0042 instead.")
    // dates are training signal, not PII — the shield keeps them intact
    assert(got.contains("2026-08-12"), got)
    assert(got.contains("12/31/2024"), got)
    // sparse digit runs: separator runs > 2 break the phone shape
    assert(got.contains("2010 - 2019"), got)
    assert(got.contains("v1.2.3"), got)
    // real phone formats (>= 7 digits, dense separators) still redact
    assert(got.contains("<PHONE>") && !got.contains("0042"), got)
    // the shield sentinel never leaks into output
    assert(!got.contains("\u0001"), "sentinel leaked")
  }

  test("SSN-shaped digit runs are redacted, not date-shielded") {
    // '123-45-6789' embeds a dd-dd-dddd tail ('23-45-6789'); an unanchored
    // date shield would sentinel-split it out of the phone redaction
    val got = scrubOne("SSN 123-45-6789 filed 12/31/2024, ref 9-12-34-5678.")
    assert(!got.contains("6789") && !got.contains("123-45"), got)
    assert(got.contains("12/31/2024"), got) // real date still preserved
    assert(!got.contains("5678"), got)      // date-tail inside longer run: redacted
    assert(!got.contains("\u0001"), "sentinel leaked")
  }

  test("dates adjacent to digit runs do not unshield them") {
    // a date directly glued to more digits/separators is NOT a date — the
    // whole run is phone/card-shaped and must redact
    val got = scrubOne("call 2024-12-310042 or 01-02-20345678 now")
    assert(!got.contains("310042") && !got.contains("20345678"), got)
  }

  test("piiCount counts matches without materializing scrubbed text") {
    import spark.implicits._
    val n = Seq("a@b.co then c@d.org then plain text")
      .toDF("t")
      .select(PiiScrub.piiCount(col("t"), PiiScrub.EmailPattern)).collect()(0).getInt(0)
    assert(n == 2)
  }

  test("adjacent dates all survive the shield (consuming-boundary alternation)") {
    import spark.implicits._
    // the shield's boundary groups CONSUME a character, so one pass
    // skips every other date in a run — the double pass must catch all
    val texts = Seq(
      "on 2024-01-02 2024-01-03 x",
      "2024-01-01,2024-01-02,2024-01-03 end",
      "d1 2024-01-01 2024-01-02 2024-01-03 2024-01-04 d4")
    val got = texts.toDF("t").select(PiiScrub.scrub(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(got.toSeq == texts, s"every date must survive: ${got.toSeq}")
  }

  test("scrub is pure map-side (no Exchange, stays in codegen)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(md5(PiiScrub.scrub(col("text"))).as("m"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.matches("(?s).*\\*\\(\\d+\\).*"), "should be whole-stage codegen'd")
  }
}
