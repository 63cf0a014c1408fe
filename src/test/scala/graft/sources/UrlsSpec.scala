package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  import Urls.canonicalize

  test("RFC 3986 normalization: case, default ports, fragments, dot-segments") {
    assert(canonicalize("HTTP://Host.Example.COM:80/a/./b/../c?b=2&a=1#frag") ==
      "http://host.example.com/a/c?a=1&b=2")
    assert(canonicalize("https://A.B:443/x") == "https://a.b/x")
    // non-default ports survive; other schemes' ports untouched
    assert(canonicalize("http://a.b:8080/x") == "http://a.b:8080/x")
    assert(canonicalize("ftp://a.b:80/x") == "ftp://a.b:80/x")
    // authority with no path gets the root path
    assert(canonicalize("http://a.b") == "http://a.b/")
    assert(canonicalize("http://a.b?q=1") == "http://a.b/?q=1")
    // RFC §5.2.4 examples
    assert(canonicalize("http://a.b/a/b/c/./../../g") == "http://a.b/a/g")
    assert(canonicalize("http://a.b/mid/content=5/../6") == "http://a.b/mid/6")
    // trailing directory forms keep their slash; .. at root clamps
    assert(canonicalize("http://a.b/a/b/..") == "http://a.b/a/")
    assert(canonicalize("http://a.b/..") == "http://a.b/")
    assert(canonicalize("http://a.b//x///y") == "http://a.b/x/y")
  }

  test("percent-encoding: unreserved decode, reserved uppercase, malformed pass-through") {
    assert(canonicalize("http://a.b/%63at") == "http://a.b/cat")     // %63 = c
    assert(canonicalize("http://a.b/%7Euser") == "http://a.b/~user") // %7E = ~
    assert(canonicalize("http://a.b/a%3fb") == "http://a.b/a%3Fb")   // '?' stays encoded
    assert(canonicalize("http://a.b/sp%20ace") == "http://a.b/sp%20ace")
    assert(canonicalize("http://a.b/bad%zz") == "http://a.b/bad%zz")
    assert(canonicalize("http://a.b/?x=%41&y=%2f") == "http://a.b/?x=A&y=%2F")
  }

  test("query: bytewise sort, tracking-param drop, empty-query collapse") {
    assert(canonicalize("http://a.b/p?z=1&a=2&m=3") == "http://a.b/p?a=2&m=3&z=1")
    assert(canonicalize("http://a.b/p?utm_source=x&a=1&fbclid=abc&gclid=g&utm_campaign=c") ==
      "http://a.b/p?a=1")
    assert(canonicalize("http://a.b/p?utm_source=x") == "http://a.b/p")
    assert(canonicalize("http://a.b/p?") == "http://a.b/p")
    // a non-tracking param whose NAME merely contains 'utm' survives
    assert(canonicalize("http://a.b/p?autumn=1") == "http://a.b/p?autumn=1")
  }

  test("contract edges: null, relative strings pass through") {
    assert(canonicalize(null) == null)
    assert(canonicalize("not a url") == "not a url")
    assert(canonicalize("/relative/path") == "/relative/path")
  }

  test("dedupByUrl: min-id winner per canonical group, map-side canon + one aggregate") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTP://A.B:80/x?b=1&a=2#f"),
      (2L, "http://a.b/x?a=2&b=1"),     // same canon as 1
      (3L, "http://a.b/x?a=2&b=1&utm_source=s"), // same again
      (4L, "https://a.b/x?a=2&b=1"),    // different scheme
      (5L, "http://a.b/y")).toDF("id", "url")
    val got = Urls.dedupByUrl(df, "url", "id")
      .select("id", "canon_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L, 4L, 5L), s"winners: ${got.keySet}")
    assert(got(1L) == "http://a.b/x?a=2&b=1")
  }
}
