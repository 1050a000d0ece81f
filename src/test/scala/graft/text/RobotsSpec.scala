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

  test("a bare-host URL evaluates as '/' — total bans catch the homepage") {
    val docs = Seq((1L, "https://banned.test"),
      (2L, "https://banned.test/")).toDF("id", "url")
    val robots = Seq(("banned.test", "User-agent: *\nDisallow: /"))
      .toDF("host", "txt")
    val out = Robots.gate(docs, "url", Robots.rulesTable(robots, "host", "txt"))
      .select("id", "robots_allowed")
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) === false, "empty path must read as '/' per RFC 9309")
    assert(out(2L) === false)
  }

  test("host-keyed rules scope per authority: a subdomain has its OWN robots") {
    val docs = Seq(
      (1L, "https://example.test/x"),
      (2L, "https://shop.example.test/x"),   // own robots allows
      (3L, "https://other.example.test/x"))  // no robots row: allowed
      .toDF("id", "url")
    val robots = Seq(
      ("example.test", "User-agent: *\nDisallow: /"),
      ("shop.example.test", "User-agent: *\nAllow: /")).toDF("host", "txt")
    val out = Robots.gate(docs, "url", Robots.rulesTable(robots, "host", "txt"))
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out(1L) === false)
    assert(out(2L) === true,
      "the apex ban must not govern a subdomain with its own robots")
    assert(out(3L) === true, "absent robots row allows (RFC default)")
  }

  test("rules match path+query: query-targeting Disallow works") {
    val docs = Seq(
      (1L, "https://q.test/page?sessionid=abc"),
      (2L, "https://q.test/page?x=1"),
      (3L, "https://q.test/page")).toDF("id", "url")
    val robots = Seq(("q.test", "User-agent: *\nDisallow: /*?sessionid="))
      .toDF("host", "txt")
    val out = Robots.gate(docs, "url", Robots.rulesTable(robots, "host", "txt"))
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out(1L) === false, "query-targeting rules must see the query")
    assert(out(2L) === true)
    assert(out(3L) === true)
  }

  test("a trailing $ doesn't count toward longest-match precedence") {
    def ok(rules: Seq[String], path: String): Boolean =
      RobotsAllowed.allowed(
        org.apache.spark.unsafe.types.UTF8String.fromString(path),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          rules.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    // 'D:/foo$' and 'A:/foo' tie on matched octets -> allow wins
    assert(ok(Seq("D:/foo$", "A:/foo"), "/foo"))
    assert(ok(Seq("A:/foo", "D:/foo$"), "/foo"))
    // the anchor still anchors; a longer disallow still outranks
    assert(!ok(Seq("D:/foo/$", "A:/foo"), "/foo/"))
  }

  test("crawl-delay and sitemap surface as audit columns; domainStats composes") {
    val robots = Seq(
      ("a.test", "User-agent: graftbot\nDisallow: /p\nCrawl-delay: 2.5\n" +
        "User-agent: *\nCrawl-delay: 99\nSitemap: https://a.test/sm1.xml\n" +
        "Sitemap: https://a.test/sm2.xml"),
      ("b.test", "User-agent: *\nDisallow: /x")).toDF("host", "txt")
    val rules = Robots.rulesTable(robots, "host", "txt", agent = "graftbot")
    val rows = rules.select("host", "crawl_delay", "sitemaps")
      .as[(String, Option[Double], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the WINNING group's delay, not the fallback group's
    assert(rows("a.test")._1 === Some(2.5))
    assert(rows("a.test")._2 ===
      Seq("https://a.test/sm1.xml", "https://a.test/sm2.xml"),
      "sitemaps are global — collected regardless of group")
    assert(rows("b.test")._1 === None)
    assert(rows("b.test")._2 === Nil)
    // scheduler view: per-domain fan-in stats + politeness directives
    val docs = Seq((1L, "https://a.test/p/1"), (2L, "https://a.test/p/2"),
      (3L, "https://b.test/y")).toDF("id", "url")
    val sched = Web.domainStats(docs, "url")
      .join(rules.withColumnRenamed("host", "domain"), Seq("domain"), "left")
      .select("domain", "n_docs", "crawl_delay")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(sched("a.test") === ((2L, Some(2.5))))
    assert(sched("b.test") === ((1L, None)))
  }
}
