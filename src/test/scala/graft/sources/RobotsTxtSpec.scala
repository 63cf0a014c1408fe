package graft.sources

import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {

  private val robots =
    """# example policy
      |User-agent: graftbot
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /*.tmp$
      |
      |User-agent: otherbot
      |User-agent: thirdbot
      |Disallow: /shared
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private def allowed(ua: String, path: String): Boolean =
    RobotsTxt.isAllowed(RobotsTxt.rulesFor(robots, ua), path)

  test("longest-match wins; tie goes to Allow (RFC 9309 §2.2.2)") {
    assert(!allowed("graftbot/1.0", "/private/doc"))
    assert(allowed("graftbot/1.0", "/private/ok/doc"),
      "Allow /private/ok (11) outranks Disallow /private (8)")
    assert(allowed("graftbot/1.0", "/public/doc"), "no rule → allowed")
  }

  test("wildcard * and end anchor $") {
    assert(!allowed("graftbot/1.0", "/tmp/file.tmp"))
    assert(allowed("graftbot/1.0", "/tmp/file.tmp.bak"),
      "$ anchors at the end — .tmp.bak must not match /*.tmp$")
    val rules = Vector(RobotsTxt.Rule(allow = false, "/a*b$"))
    assert(!RobotsTxt.isAllowed(rules, "/aXXb"))
    assert(RobotsTxt.isAllowed(rules, "/aXXbc"))
    assert(RobotsTxt.isAllowed(rules, "/ab-but-not-at-end/x"))
  }

  test("stacked user-agent lines share a group; agent match is longest token") {
    assert(!allowed("otherbot", "/shared/x"))
    assert(!allowed("thirdbot", "/shared/x"))
    assert(allowed("otherbot", "/private/doc"),
      "otherbot obeys ITS group, not graftbot's")
  }

  test("unknown agent falls back to the * group; missing robots allows all") {
    assert(!allowed("strangerbot", "/anything"))
    assert(RobotsTxt.isAllowed(RobotsTxt.rulesFor(null, "x"), "/anything"))
    assert(RobotsTxt.isAllowed(RobotsTxt.rulesFor("", "x"), "/anything"))
  }

  test("comments strip; keys are case-insensitive; empty Disallow allows all") {
    val r = RobotsTxt.rulesFor(
      "USER-AGENT: bot # trailing comment\nDISALLOW:\nAllow: /x\n", "bot")
    assert(r == Vector(RobotsTxt.Rule(allow = true, "/x")))
  }

  test("allowUrls: one host join, hosts without robots allowed, map-side eval") {
    import spark.implicits._
    val urls = Seq(
      ("a.example", "/private/doc"), ("a.example", "/private/ok/doc"),
      ("a.example", "/public/doc"), ("norobots.example", "/anything"))
      .toDF("host", "path")
    val robotsDf = Seq(("a.example", robots)).toDF("host", "body")
    val gotMap = RobotsTxt.allowUrls(urls, robotsDf, "host", "path", "body",
        userAgent = "graftbot/1.0")
      .select("host", "path", "allowed")
      .as[(String, String, Boolean)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(gotMap(("a.example", "/private/doc")) == false)
    assert(gotMap(("a.example", "/private/ok/doc")) == true)
    assert(gotMap(("a.example", "/public/doc")) == true)
    assert(gotMap(("norobots.example", "/anything")) == true)
  }
}
