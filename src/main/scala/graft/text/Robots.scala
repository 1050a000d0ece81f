package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl gating (RFC 9309, the Robots Exclusion Protocol —
  * the FIRST legal/etiquette gate a crawl pipeline applies, before even
  * the URL-pattern filters): per-domain rule parsing and per-URL
  * allow/deny evaluation.
  *
  * Parsing follows the RFC: groups of `user-agent` lines followed by
  * `allow`/`disallow` rules; the group whose agent token is the
  * LONGEST case-insensitive prefix of the product token wins, falling
  * back to the `*` group; comments are ignored; an empty disallow
  * value allows everything. `crawl-delay` (per-group) and `sitemap`
  * (global) surface as audit columns for the crawl scheduler — the
  * gate itself ignores them. Matching is RFC longest-match over the
  * URL's path+query: the rule whose pattern has the most OCTETS wins
  * (a trailing `$` anchor doesn't count — it matches no octet), allow
  * winning ties; patterns support `*` wildcards and the `$` end
  * anchor; an empty path evaluates as "/".
  *
  * Scale shape: rules are parsed ONCE per authority (map-only over the
  * bounded robots table), URLs join their HOST's rules (the RFC §2.3
  * authority scope; a domain-keyed table joins on the registered
  * domain instead, documented approximate), and the per-URL evaluation
  * is a native codegen expression ([[graft.functions.RobotsAllowed]])
  * over the joined rules array — no UDF, no driver participation. A
  * URL whose authority has NO robots row is allowed (the RFC default).
  *
  * Reference behavior: nexus-processor has no crawl surface; builder-
  * brief web-curation addition (the [[Web]] family).
  */
object Robots {

  /** Everything a crawl scheduler reads out of one robots.txt for one
    * agent: the allow/disallow rules the gate evaluates, the winning
    * group's `crawl-delay` (seconds; the de-facto politeness directive
    * — not in RFC 9309 but honored by most crawlers), and the file's
    * `sitemap` URLs (per the sitemaps protocol these are GLOBAL —
    * independent of any user-agent group). */
  final case class RobotsInfo(rules: Array[String],
                              crawlDelay: Option[Double],
                              sitemaps: Array[String])

  private final class Group {
    val agents = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[String]
    var delay: Option[Double] = None
  }

  /** Parse one robots.txt body for `agent` — rules as compact
    * `"A:<pattern>"` / `"D:<pattern>"` strings (the form
    * [[graft.functions.RobotsAllowed]] evaluates), plus the
    * crawl-delay / sitemap operational surface. Group selection per
    * RFC 9309 §2.2.1: the most specific matching user-agent token
    * wins; `*` is the fallback group. When several groups tie, their
    * rules merge and the LARGEST crawl-delay wins (the polite read of
    * conflicting directives). */
  def parseRobots(txt: String, agent: String): RobotsInfo = {
    if (txt == null) return RobotsInfo(Array.empty, None, Array.empty)
    val agentLc = agent.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var current: Option[Group] = None
    var lastWasAgent = false
    txt.split("\n").foreach { line0 =>
      val line = line0.split("#", 2)(0).trim // comments run to EOL
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!lastWasAgent || current.isEmpty) {
              val g = new Group
              groups += g
              current = Some(g)
            }
            current.foreach(_.agents += value.toLowerCase)
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            // rules before any user-agent line are ignored (RFC)
            current.foreach { g =>
              // an empty disallow allows everything: no rule at all
              if (value.nonEmpty)
                g.rules += (if (key == "allow") "A:" else "D:") + value
            }
          case "crawl-delay" =>
            lastWasAgent = false
            current.foreach { g =>
              value.toDoubleOption.filter(d => d >= 0 && !d.isNaN)
                .foreach(d => g.delay = Some(g.delay.fold(d)(math.max(_, d))))
            }
          case "sitemap" =>
            // global per the sitemaps protocol — group position ignored
            lastWasAgent = false
            if (value.nonEmpty) sitemaps += value
          case _ => lastWasAgent = false // unknown directives, junk
        }
      }
    }
    // most specific agent token that PREFIX-matches ours; '*' fallback
    val scored = groups.flatMap { g =>
      val best = g.agents.flatMap { a =>
        if (a == "*") Some(0)
        else if (agentLc.startsWith(a)) Some(a.length)
        else None
      }
      if (best.isEmpty) None else Some((best.max, g))
    }
    if (scored.isEmpty) RobotsInfo(Array.empty, None, sitemaps.toArray)
    else {
      val top = scored.map(_._1).max
      val winners = scored.filter(_._1 == top).map(_._2)
      RobotsInfo(winners.flatMap(_.rules).toArray,
        winners.flatMap(_.delay).maxOption,
        sitemaps.toArray)
    }
  }

  /** The allow/disallow rule list alone (the gate's input). */
  def parseRules(txt: String, agent: String): Array[String] =
    parseRobots(txt, agent).rules

  /** (key, robots_rules, crawl_delay, sitemaps) from a (key, robots.txt)
    * table — map-only; parse once per authority, never per URL.
    * `keyCol` is whatever the robots fetch was keyed by — naturally the
    * HOST (robots.txt scopes per authority, RFC 9309 §2.3); name it
    * `host` and [[gate]] joins RFC-correctly. `crawl_delay` (seconds)
    * and `sitemaps` are the scheduler's audit columns; the gate ignores
    * them. */
  def rulesTable(robots: DataFrame, keyCol: String, txtCol: String,
                 agent: String = "*"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(keyCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .map { case (k, txt) =>
        val info = parseRobots(txt, agent)
        (k, info.rules, info.crawlDelay, info.sitemaps)
      }
      .toDF(keyCol, "robots_rules", "crawl_delay", "sitemaps")
  }

  /** Is `path` allowed under `rules`? Native codegen expression; a
    * NULL rules array (no robots row for the domain) allows — the RFC
    * default for an absent robots.txt. */
  def allowedCol(path: Column, rules: Column): Column =
    coalesce(graft.functions.RobotsAllowed.col(path, rules), lit(true))

  /** [[Web.urlFlags]] + the robots gate: URLs join their authority's
    * parsed rules and gain `robots_allowed`; `kept` becomes
    * blocklist-kept AND robots-allowed. `robotsRules` is a frame from
    * [[rulesTable]]: keyed by `host` the join is RFC-correct (robots
    * scopes per authority, §2.3 — a subdomain's own robots.txt
    * governs it); a frame keyed by `domain` instead joins on the
    * registered domain — an APPROXIMATION (example.com's rules govern
    * shop.example.com) for corpora whose robots fetches were keyed
    * that way. Rules match the URL's PATH+QUERY (§2.2.2 — query-
    * targeting rules like a disallow of `*?sessionid=` work), with an
    * empty path reading as "/" (a bare `https://site` under
    * `Disallow: /` is banned). Audit columns (crawl_delay, sitemaps)
    * in `robotsRules` are ignored here — only the rules join. */
  def gate(docs: DataFrame, urlCol: String, robotsRules: DataFrame,
           blockedDomains: Seq[String] = Nil,
           publicSuffixes: Seq[String] = Nil): DataFrame = {
    val flagged = Web.urlFlags(docs, urlCol, blockedDomains, publicSuffixes)
    val key = if (robotsRules.columns.contains("host")) "host" else "domain"
    val pq = Web.pathQuery(col(urlCol))
    val evalPath = when(length(pq) === 0, lit("/")).otherwise(pq)
    flagged.join(robotsRules.select(col(key), col("robots_rules")),
        Seq(key), "left")
      .withColumn("robots_allowed", allowedCol(evalPath, col("robots_rules")))
      .withColumn("kept", col("kept") && col("robots_allowed"))
      .drop("robots_rules")
  }
}
