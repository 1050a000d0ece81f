package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.RobotsAllowed

/** RFC 9309 robots gating: group selection, longest-match with allow
  * ties, wildcards and anchors, defaults, and the Spark-side join +
  * native-expression gate. */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private val txt =
    """# site robots
      |User-agent: badbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.pdf$
      |Disallow: /tmp*
      |Allow:
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /search
      |""".stripMargin

  test("group selection: specific agent beats *, longest token wins") {
    val g = Robots.parseRules(txt, "graftbot/1.2")
    assert(g.toSet === Set("D:/private/", "A:/private/public/",
      "D:/*.pdf$", "D:/tmp*"))
    // an unknown agent falls back to the * group
    assert(Robots.parseRules(txt, "randombot").toSet === Set("D:/search"))
    // badbot gets its own total ban
    assert(Robots.parseRules(txt, "badbot").toSeq === Seq("D:/"))
    // directives before any user-agent line are ignored
    assert(Robots.parseRules("Disallow: /x\nUser-agent: *\nDisallow: /y",
      "a").toSeq === Seq("D:/y"))
    // no matching group at all -> empty rules -> everything allowed
    assert(Robots.parseRules("User-agent: onlybot\nDisallow: /", "me").isEmpty)
  }

  test("RFC matching: longest-match, allow ties, wildcards, anchors") {
    def ok(rules: Seq[String], path: String): Boolean =
      RobotsAllowed.allowed(
        org.apache.spark.unsafe.types.UTF8String.fromString(path),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          rules.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    val rules = Robots.parseRules(txt, "graftbot").toSeq
    assert(!ok(rules, "/private/a"))
    assert(ok(rules, "/private/public/x")) // longer allow overrides
    assert(ok(rules, "/docs/report"))
    assert(!ok(rules, "/docs/report.pdf"))  // wildcard + anchor
    assert(ok(rules, "/docs/report.pdfx")) // $ anchors the END
    assert(!ok(rules, "/tmp"))             // prefix via trailing *
    assert(!ok(rules, "/tmp/file"))
    assert(ok(Nil, "/anything"))           // no rules -> allowed
    // equal-length allow/disallow: allow wins (RFC tie rule)
    assert(ok(Seq("D:/a/", "A:/a/"), "/a/x"))
    // pattern matching is on the PATH prefix, not substrings
    assert(ok(Seq("D:/b"), "/a/b"))
    // '*' backtracking: pattern needs a later literal
    assert(!ok(Seq("D:/*/secret"), "/x/y/secret"))
    assert(ok(Seq("D:/*/secret"), "/x/ysecret-not"))
  }

  test("Spark gate: per-domain rules join, native expression, RFC defaults") {
    val docs = Seq(
      (1L, "https://a.test/private/x"),
      (2L, "https://a.test/private/public/x"),
      (3L, "https://a.test/ok"),
      (4L, "https://b.test/search"),       // * group of b.test
      (5L, "https://norobots.test/x"),     // no robots row: allowed
      (6L, "https://blocked.test/x"))      // blocklist composes
      .toDF("id", "url")
    val robots = Seq(
      ("a.test", txt),
      ("b.test", "User-agent: *\nDisallow: /search")).toDF("domain", "txt")
    val rules = Robots.rulesTable(robots, "domain", "txt", agent = "graftbot")
    val out = Robots.gate(docs, "url", rules,
        blockedDomains = Seq("blocked.test"))
      .select("id", "robots_allowed", "kept")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, false, false)))
    assert(out(2L) === ((2L, true, true)))
    assert(out(3L) === ((3L, true, true)))
    assert(out(4L) === ((4L, false, false)))
    assert(out(5L) === ((5L, true, true)))
    assert(out(6L) === ((6L, true, false))) // robots-allowed, blocklisted
    // the gate is codegen scan work: no UDF anywhere in the plan
    val plan = Robots.gate(docs, "url", rules).queryExecution
      .executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
