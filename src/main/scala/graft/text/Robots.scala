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
  * back to the `*` group; unknown directives (crawl-delay, sitemap)
  * and comments are ignored; an empty disallow value allows
  * everything. Matching is RFC longest-match: the rule whose pattern
  * has the most OCTETS wins, allow winning ties; patterns support `*`
  * wildcards and the `$` end anchor.
  *
  * Scale shape: rules are parsed ONCE per domain (map-only over the
  * bounded robots table), URLs join their domain's rules on the
  * registered domain (the natural low-cardinality key — the same
  * shuffle domainStats already pays), and the per-row evaluation is a
  * native codegen expression ([[graft.functions.RobotsAllowed]]) over
  * the joined rules array — no UDF, no driver participation. A URL
  * whose domain has NO robots row is allowed (the RFC default).
  *
  * Reference behavior: nexus-processor has no crawl surface; builder-
  * brief web-curation addition (the [[Web]] family).
  */
object Robots {

  /** Parse one robots.txt body into the rule list for `agent` —
    * compact `"A:<pattern>"` / `"D:<pattern>"` strings (the form
    * [[graft.functions.RobotsAllowed]] evaluates). Group selection per
    * RFC 9309 §2.2.1: the most specific matching user-agent token
    * wins; `*` is the fallback group. */
  def parseRules(txt: String, agent: String): Array[String] = {
    if (txt == null) return Array.empty
    val agentLc = agent.toLowerCase
    // collect groups: (agent tokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[String])]
    var current: Option[(scala.collection.mutable.ArrayBuffer[String],
                         scala.collection.mutable.ArrayBuffer[String])] = None
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
              val g = (scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[String])
              groups += g
              current = Some(g)
            }
            current.foreach(_._1 += value.toLowerCase)
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            // rules before any user-agent line are ignored (RFC)
            current.foreach { g =>
              // an empty disallow allows everything: no rule at all
              if (value.nonEmpty)
                g._2 += (if (key == "allow") "A:" else "D:") + value
            }
          case _ => lastWasAgent = false // crawl-delay, sitemap, junk
        }
      }
    }
    // most specific agent token that PREFIX-matches ours; '*' fallback
    val scored = groups.flatMap { case (agents, rules) =>
      val best = agents.flatMap { a =>
        if (a == "*") Some(0)
        else if (agentLc.startsWith(a)) Some(a.length)
        else None
      }
      if (best.isEmpty) None else Some((best.max, rules))
    }
    if (scored.isEmpty) Array.empty
    else {
      val top = scored.map(_._1).max
      scored.filter(_._1 == top).flatMap(_._2).toArray
    }
  }

  /** (domain, robots_rules array) from a (domain, robots.txt) table —
    * map-only; parse once per domain, never per URL. */
  def rulesTable(robots: DataFrame, domainCol: String, txtCol: String,
                 agent: String = "*"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(domainCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .map { case (dom, txt) => (dom, parseRules(txt, agent)) }
      .toDF(domainCol, "robots_rules")
  }

  /** Is `path` allowed under `rules`? Native codegen expression; a
    * NULL rules array (no robots row for the domain) allows — the RFC
    * default for an absent robots.txt. */
  def allowedCol(path: Column, rules: Column): Column =
    coalesce(graft.functions.RobotsAllowed.col(path, rules), lit(true))

  /** [[Web.urlFlags]] + the robots gate: URLs join their registered
    * domain's parsed rules and gain `robots_allowed`; `kept` becomes
    * blocklist-kept AND robots-allowed. `robotsRules` is a
    * (domain, robots_rules) frame from [[rulesTable]]. */
  def gate(docs: DataFrame, urlCol: String, robotsRules: DataFrame,
           blockedDomains: Seq[String] = Nil,
           publicSuffixes: Seq[String] = Nil): DataFrame = {
    val flagged = Web.urlFlags(docs, urlCol, blockedDomains, publicSuffixes)
    flagged.join(robotsRules, Seq("domain"), "left")
      .withColumn("robots_allowed",
        allowedCol(col("url_path"), col("robots_rules")))
      .withColumn("kept", col("kept") && col("robots_allowed"))
      .drop("robots_rules")
  }
}
