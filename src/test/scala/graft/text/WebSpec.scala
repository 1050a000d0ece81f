package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Edge cases for the URL curation family the planted-URL oracles
  * (url_filter, domain_stats) don't reach: scheme-less strings, bare
  * hosts, deep subdomains, null propagation, and the subdomain-vs-
  * look-alike blocklist distinction.
  */
class WebSpec extends SparkSuite {
  import spark.implicits._

  private def flags(urls: (Long, String)*) =
    Web.urlFlags(urls.toSeq.toDF("id", "url"), "url", Seq("blocked.test"))
      .select("id", "scheme", "host", "domain", "url_path", "kept")
      .as[(Long, String, String, String, String, Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap

  test("parses scheme, host, domain, path; strips userinfo and port") {
    val out = flags(
      1L -> "https://Sub.Deep.Example.COM:443/a/b/c?q=1#frag",
      2L -> "http://user:pw@blocked.test/x",
      3L -> "ftp://files.example.org")
    assert(out(1L) === ((1L, "https", "sub.deep.example.com", "example.com",
      "/a/b/c", Some(true))))
    assert(out(2L) === ((2L, "http", "blocked.test", "blocked.test", "/x",
      Some(false))))
    assert(out(3L) === ((3L, "ftp", "files.example.org", "example.org", "",
      Some(true))))
  }

  test("subdomains of a blocked domain are blocked; look-alikes are not") {
    val out = flags(
      1L -> "http://ads.blocked.test/t",
      2L -> "http://notblocked.test/t",
      3L -> "http://blocked.test.evil.example/t") // registered domain evil.example
    assert(out(1L)._6 === Some(false))
    assert(out(2L)._6 === Some(true))
    assert(out(3L)._6 === Some(true))
  }

  test("scheme-less strings and bare hosts degrade without throwing") {
    val out = flags(
      1L -> "no scheme at all",
      2L -> "http://localhost:8080/health")
    assert(out(1L)._2 === "" && out(1L)._3 === "" && out(1L)._5 === "")
    assert(out(2L)._3 === "localhost" && out(2L)._4 === "localhost")
  }

  test("null url propagates null columns") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "url")
    val row = Web.urlFlags(df, "url", Seq("blocked.test"))
      .select("scheme", "host", "domain", "kept").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("domainStats aggregates per registered domain") {
    val df = Seq(
      (1L, "http://a.x.test/p1"), (2L, "http://b.x.test/p2"),
      (3L, "http://x.test/p1"), (4L, "http://y.example/p")).toDF("id", "url")
    val out = Web.domainStats(df, "url")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("x.test") === ((3L, 2L)))
    assert(out("y.example") === ((1L, 1L)))
  }

  test("canonicalUrl: ports, params, fragments, case, passthrough") {
    val df = Seq(
      1L -> "HTTPS://Host.TEST:443/Keep/Case?utm_source=a&x=1&gclid=z&y=2#f",
      2L -> "http://u:p@a.test:80/p",
      3L -> "https://a.test:8443/p", // non-default port preserved
      4L -> "https://a.test/p?utm_a=1&UTM_B=2", // all params tracked: no '?'
      5L -> "no scheme here").toDF("id", "url")
    val out = df.select(col("id"), Web.canonicalUrl(col("url")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "https://host.test/Keep/Case?x=1&y=2")
    assert(out(2L) === "http://a.test/p")
    assert(out(3L) === "https://a.test:8443/p")
    assert(out(4L) === "https://a.test/p")
    assert(out(5L) === "no scheme here")
  }

  test("urlDedupGroups: min-id survivor, singletons excluded") {
    val df = Seq(
      (1L, "https://A.test/x?utm_s=1"),
      (2L, "https://a.test:443/x"),
      (3L, "https://a.test/y")).toDF("id", "url")
    val out = Web.urlDedupGroups(df, "url", "id")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("https://a.test/x", 2L, 1L)))
  }

  test("urlFlags plan is map-only (no exchange before the gate)") {
    val df = Seq((1L, "http://a.test/p")).toDF("id", "url")
    val plan = Web.urlFlags(df, "url", Seq("b.test"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"urlFlags must be map-only:\n$plan")
  }

  test("PSL hook: longest-suffix-wins registered domains, default unchanged") {
    import spark.implicits._
    val psl = Seq("co.uk", "com.au", "com", "uk")
    val hosts = Seq(
      (1L, "shop.example.co.uk"),
      (2L, "example.co.uk"),
      (3L, "co.uk"),                 // IS a public suffix: falls back
      (4L, "a.b.example.com"),
      (5L, "foo.internal"),          // matches nothing: two-label rule
      (6L, "localhost"),
      (7L, "x.parliament.uk"))       // "uk" matches, "co.uk" does not
      .toDF("id", "h")
    val got = hosts.select(col("id"),
        Web.registeredDomain(col("h"), psl).as("dom"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "example.co.uk",   // NOT "co.uk" (the two-label default)
      2L -> "example.co.uk",
      3L -> "co.uk",
      4L -> "example.com",
      5L -> "foo.internal",
      6L -> "localhost",
      7L -> "parliament.uk"))
    // label-boundary discipline: "xco.uk" must NOT match suffix "co.uk"
    val edge = Seq((1L, "xco.uk")).toDF("id", "h")
      .select(Web.registeredDomain(col("h"), psl).as("dom"))
      .as[String].head()
    assert(edge == "xco.uk")
    // the empty table IS the default rule
    val same = hosts.select(
        (Web.registeredDomain(col("h"), Nil) ===
          Web.registeredDomain(col("h"))).as("eq"))
      .as[Boolean].collect()
    assert(same.forall(identity))
  }

  test("PSL-aware blocklist: the real registrant becomes nameable") {
    import spark.implicits._
    // co.test plays the co.uk role: the suffix TABLE drives the
    // semantics, and reserved .test hosts keep fixtures synthetic
    val docs = Seq(
      (1L, "https://shop.registrant.co.test/a"),
      (2L, "https://other.co.test/b"),
      (3L, "https://example.com/c")).toDF("id", "url")
    // without the PSL, "registrant.co.test" never matches (domain =
    // "co.test")
    val without = Web.urlFlags(docs, "url", Seq("registrant.co.test"))
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(without === Map(1L -> true, 2L -> true, 3L -> true))
    // with it, the registrant blocks and its co.test neighbor survives
    val withPsl = Web.urlFlags(docs, "url", Seq("registrant.co.test"),
        publicSuffixes = Seq("co.test", "com"))
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(withPsl === Map(1L -> false, 2L -> true, 3L -> true))
  }
}
