package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol evaluator (RFC 9309 — public spec; the
  * crawl-side gate every fetch pipeline applies before a URL is even
  * requested, and the re-filter a 100 TB corpus applies retroactively
  * when a host's policy changes).
  *
  * Semantics implemented exactly as RFC 9309 states them:
  *  - GROUPS: consecutive `User-agent:` lines share the group that
  *    follows; a crawler obeys the group(s) whose agent token is the
  *    LONGEST case-insensitive substring-token match of its product
  *    token, falling back to the `*` group; all groups with the same
  *    matched token merge (§2.2.1).
  *  - RULES: `Allow`/`Disallow` path patterns with `*` (any octets)
  *    and a final `$` (end anchor), matched from the path start. The
  *    MOST SPECIFIC match wins = longest pattern in octets; tie →
  *    Allow wins (§2.2.2). No matching rule, empty Disallow, or no
  *    robots.txt at all → allowed.
  *  - Comments (`#`) and unknown directives are ignored; keys are
  *    case-insensitive.
  *
  * Scale shape: robots bodies parse map-side into per-host rule
  * arrays (host-sized table); URLs join their host's rules with ONE
  * hash equi-join on the host (hosts are many at web scale — never a
  * broadcast by default) and evaluate map-side per URL. No corpus
  * self-join, no window.
  */
object RobotsTxt {

  /** One rule: allow?, raw pattern, pattern length (the specificity). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body into the rule list the given agent obeys
    * (RFC 9309 group selection + merge). Null/empty body → no rules
    * (allow everything).
    */
  def rulesFor(body: String, userAgent: String): Vector[Rule] = {
    if (body == null || body.isEmpty) return Vector.empty
    final case class Group(agents: Vector[String], rules: Vector[Rule])
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inAgents = true // consecutive User-agent lines stack into one group
    def close(): Unit = if (agents.nonEmpty) groups += Group(agents, rules)
    for (raw <- body.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { close(); agents = Vector.empty; rules = Vector.empty }
            agents :+= value.toLowerCase
            inAgents = true
          case "allow" | "disallow" if agents.nonEmpty =>
            // an empty Disallow means "allow all" — representable as no rule
            if (value.nonEmpty) rules :+= Rule(key == "allow", value)
            inAgents = false
          case _ => inAgents = false // unknown directive ends the agent run
        }
      }
    }
    close()
    val all = groups.result()
    val ua = userAgent.toLowerCase
    // longest agent token that is a substring of the product token;
    // '*' only as the fallback
    val best = all.iterator.flatMap(_.agents).filter(a => a != "*" && ua.contains(a))
      .reduceOption((a, b) => if (b.length > a.length) b else a)
    val chosen = best match {
      case Some(tok) => all.filter(_.agents.contains(tok))
      case None => all.filter(_.agents.contains("*"))
    }
    chosen.flatMap(_.rules)
  }

  /** Does `pattern` (with `*` wildcards and an optional final `$`
    * anchor) match `path` from the start?
    */
  private[sources] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    // greedy left-to-right segment placement; first segment anchored at 0
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val seg = parts(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == parts.length - 1 && anchored) {
        // last segment must sit at the very end
        return path.length - pos >= seg.length && path.endsWith(seg)
      } else if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length || parts.last.isEmpty && pos <= path.length
    else true
  }

  /** RFC 9309 §2.2.2 decision: most specific (longest-pattern) matching
    * rule wins, ties go to Allow, no match → allowed.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** DataFrame form: gate a URL table against a per-host robots table.
    *
    * `urls` carries (hostCol, pathCol); `robots` carries (hostCol,
    * bodyCol) — one row per host. Adds `allowed` (URLs of hosts with
    * no robots row are allowed, the RFC's missing-file rule). ONE hash
    * equi-join on the host + map-side parse/eval; the robots side is
    * parsed once per host row, not per URL.
    */
  def allowUrls(urls: DataFrame, robots: DataFrame, hostCol: String,
                pathCol: String, bodyCol: String,
                userAgent: String): DataFrame = {
    val parseUdf = udf((body: String) =>
      rulesFor(body, userAgent).map(r => (r.allow, r.pattern)))
    val evalUdf = udf((rules: Seq[(Boolean, String)], path: String) =>
      isAllowed(if (rules == null) Nil else rules.map(t => Rule(t._1, t._2)),
        if (path == null) "" else path))
    val ruleTable = robots.select(col(hostCol), parseUdf(col(bodyCol)).as("__rules"))
    urls.join(ruleTable, Seq(hostCol), "left")
      .withColumn("allowed", evalUdf(col("__rules"), col(pathCol)))
      .drop("__rules")
  }
}
