package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization every crawl-scale URL
  * dedup runs BEFORE hashing (C4/FineWeb practice; RFC 3986 §6
  * syntax-based normalization plus the crawl conventions): the same
  * page arrives as `HTTP://Host.Example.COM:80/a/./b/../c?b=2&a=1#x`
  * and `http://host.example.com/a/c?a=1&b=2`, and an un-normalized
  * dedup counts them as two documents.
  *
  * Rules (each cited to its source):
  *   - scheme and host lowercase (RFC 3986 §6.2.2.1);
  *   - default ports stripped — :80 for http, :443 for https
  *     (§6.2.3);
  *   - fragment removed (it never reaches the server — §3.5);
  *   - dot-segments resolved, `/a/./b/../c` → `/a/c` (§5.2.4; empty
  *     segments from duplicate slashes collapse too);
  *   - percent-encodings of UNRESERVED chars decoded (`%63` → `c`),
  *     all other encodings uppercased (`%3f` → `%3F`) (§6.2.2.2);
  *   - query parameters sorted bytewise (the crawl convention — param
  *     order is almost never semantic) and tracking params dropped
  *     (`utm_*`, `fbclid`, `gclid` — the FineWeb/CCNet blocklist);
  *   - an authority with no path gets `/` (§6.2.3).
  *
  * Scale shape: a pure per-row string function (map-side UDF, no
  * shuffle); [[dedupByUrl]] adds the one hash aggregate a URL-level
  * dedup needs.
  */
object Urls {

  /** Tracking params dropped from query strings (exact or prefix). */
  val TrackingExact: Set[String] = Set("fbclid", "gclid")
  val TrackingPrefix = "utm_"

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode %XX of unreserved chars; uppercase the hex of the rest;
    * malformed escapes pass through untouched.
    */
  private[sources] def normalizePercent(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 dot-segment removal over a rooted path; empty
    * segments (duplicate slashes) collapse; a trailing `.`/`..`/`/`
    * keeps the directory form's trailing slash.
    */
  private[sources] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var endSlash = false
    path.split("/", -1).drop(1).foreach {
      case "."  => endSlash = true
      case ".." => if (out.nonEmpty) out.remove(out.length - 1); endSlash = true
      case ""   => endSlash = true
      case s    => out += s; endSlash = false
    }
    "/" + out.mkString("/") + (if (endSlash && out.nonEmpty) "/" else "")
  }

  /** The full canonicalization. Null → null; a string without
    * `://` is not an absolute URL and passes through unchanged (the
    * parse-don't-guess contract).
    */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val noFrag = {
      val h = url.indexOf('#')
      if (h < 0) url else url.substring(0, h)
    }
    val schemeEnd = noFrag.indexOf("://")
    if (schemeEnd < 0) return noFrag
    val scheme = noFrag.substring(0, schemeEnd).toLowerCase
    val rest = noFrag.substring(schemeEnd + 3)
    val qIdx = rest.indexOf('?')
    val (authPath, query) =
      if (qIdx < 0) (rest, None) else (rest.substring(0, qIdx), Some(rest.substring(qIdx + 1)))
    val slash = authPath.indexOf('/')
    val (auth, path) =
      if (slash < 0) (authPath, "/") else (authPath.substring(0, slash), authPath.substring(slash))
    val authLc = auth.toLowerCase
    val authNorm =
      if (scheme == "http" && authLc.endsWith(":80")) authLc.dropRight(3)
      else if (scheme == "https" && authLc.endsWith(":443")) authLc.dropRight(4)
      else authLc
    val pathNorm = removeDotSegments(normalizePercent(path))
    val queryNorm = query.map { q =>
      q.split("&").toSeq.filter(_.nonEmpty)
        .map(normalizePercent)
        .filterNot { p =>
          val key = p.split("=", 2)(0)
          key.startsWith(TrackingPrefix) || TrackingExact.contains(key)
        }
        .sorted.mkString("&")
    }.filter(_.nonEmpty)
    scheme + "://" + authNorm + pathNorm + queryNorm.map("?" + _).getOrElse("")
  }

  /** Column form (map-side UDF — string surgery Catalyst can't
    * express natively; the NocExtract precedent).
    */
  def canonical(url: Column): Column = {
    val f = udf((u: String) => canonicalize(u))
    f(url)
  }

  /** URL-level dedup: min-`idCol` winner per canonical URL — ONE hash
    * aggregate on the canonical key plus a semi join back, the q22
    * exact-dedup shape applied to the URL axis.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val withCanon = df.withColumn("__canon", canonical(col(urlCol)))
    val winners = withCanon.groupBy(col("__canon"))
      .agg(min(col(idCol)).as(idCol))
    withCanon.join(winners, Seq("__canon", idCol), "left_semi")
      .withColumnRenamed("__canon", "canon_url")
  }
}
