package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation for web-crawl corpora (C4 §2.2 / RefinedWeb §3.1
  * shape: URL parsing, registered-domain extraction, and a blocked-domain
  * gate run BEFORE any text is even fetched/decoded — the cheapest filter
  * in the pipeline, so it goes first).
  *
  * All parsing is RE2-subset `regexp_extract`/`regexp_replace` over the
  * URL string — pure codegen scan work, no UDF, no java.net.URI (whose
  * parse failures throw and whose semantics DuckDB cannot replay). The
  * same patterns run verbatim in the DuckDB oracle.
  *
  * At 100 TB: per-URL columns are map-only; per-domain aggregations
  * (domain counts, per-domain caps via [[graft.ops.Sampling.clusterCapped]]
  * keyed on `domain`) shuffle on the registered domain — the natural,
  * low-cardinality key. Hot domains are exactly what
  * [[graft.ops.Skew.skewAudit]] probes.
  */
object Web {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased scheme, or '' when the string has no scheme prefix. */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host with any userinfo@ and :port stripped; '' on a
    * scheme-less string.
    */
  def host(url: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(url, HostRe, 1), "^[^@]*@", ""), ":[0-9]+$", ""))

  /** Path component ('' when absent; query/fragment excluded). */
  def path(url: Column): Column = regexp_extract(url, PathRe, 1)

  /** Path + '?' + query ('' query → just the path; fragment excluded) —
    * what robots.txt rules match against (RFC 9309 §2.2.2), where
    * query-targeting rules like a disallow of `*?sessionid=` must see the
    * query string [[path]] deliberately strips. */
  def pathQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    concat(path(url),
      when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^#]*\\?"),
        concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registered domain = the last two dot-labels of the host ("a.b.c.com"
    * -> "c.com"); a single-label host (e.g. "localhost") is its own
    * domain. Public-suffix-list awareness ("co.uk") is deliberately out
    * of scope — the PSL is a versioned external artifact; callers who
    * need it pass 3-label domains in their blocklists.
    */
  def registeredDomain(hostCol: Column): Column =
    when(hostCol.rlike("\\."),
      regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1))
      .otherwise(hostCol)

  /** Registered domain with a caller-supplied PUBLIC-SUFFIX table (r14
    * — the PSL hook: the real list is a versioned external artifact the
    * engine deliberately doesn't pin; a crawl curator loads a snapshot
    * and passes it here). Semantics are the PSL algorithm on the plain-
    * rule subset (no wildcard/exception rules): the LONGEST suffix the
    * host ends with (on label boundaries) wins, and the registered
    * domain is that suffix plus ONE more label — so "shop.example.co.uk"
    * with "co.uk" in the table yields "example.co.uk", where the
    * two-label default would yield "co.uk" and a blocklist entry could
    * never name the real registrant. A host that IS a public suffix, or
    * matches nothing, falls back to [[registeredDomain]]'s two-label
    * rule (conservative: never empty).
    *
    * Still pure column expressions — the table renders as literal
    * arrays grouped by label count (the PSL is ~9k entries, KBs; the
    * per-row cost is a linear membership scan per label depth, fine for
    * scan-side gating). An empty table is exactly the default rule.
    */
  def registeredDomain(hostCol: Column,
                       publicSuffixes: Seq[String]): Column = {
    val norm = publicSuffixes.map(_.trim.toLowerCase.stripPrefix("."))
      .filter(_.nonEmpty).distinct
    if (norm.isEmpty) registeredDomain(hostCol)
    else {
      val byLabels = norm.groupBy(_.count(_ == '.') + 1)
      def lastLabels(k: Int): Column =
        regexp_extract(hostCol,
          "((?:[^.]+\\.){" + (k - 1) + "}[^.]+)$", 1)
      // fold from the SHORTEST suffix length up, so longer matches
      // override (longest-match-wins, the PSL rule)
      byLabels.keys.toSeq.sorted.foldLeft(registeredDomain(hostCol)) {
        (acc, k) =>
          val hit = array_contains(
            array(byLabels(k).sorted.map(lit): _*), lastLabels(k))
          // ...and the host must HAVE a label beyond the suffix
          val hasMore = hostCol.rlike("(?:[^.]+\\.){" + k + "}[^.]+$")
          when(hit && hasMore, lastLabels(k + 1)).otherwise(acc)
      }
    }
  }

  /** Per-URL parse + blocked-domain gate. Input columns pass through
    * (composes with annotation stages without a re-join); adds `scheme`,
    * `host`, `domain`, `url_path`, and `kept` = domain not blocked.
    * Blocklist matching is exact on the registered domain, lowercased —
    * subdomains of a blocked domain are blocked (they share its
    * registered domain), unrelated look-alikes ("notspamsite.net" vs
    * "spamsite.net") are not.
    */
  def urlFlags(docs: DataFrame, urlCol: String,
               blockedDomains: Seq[String],
               publicSuffixes: Seq[String] = Nil): DataFrame = {
    val h = host(col(urlCol))
    val dom = registeredDomain(h, publicSuffixes)
    val blockCol =
      if (blockedDomains.isEmpty) lit(true)
      else !array_contains(
        array(blockedDomains.map(d => lit(d.toLowerCase)): _*), dom)
    docs.select(col("*"),
      scheme(col(urlCol)).as("scheme"),
      h.as("host"),
      dom.as("domain"),
      path(col(urlCol)).as("url_path"),
      blockCol.as("kept"))
  }

  /** Per-domain corpus profile: doc count + distinct path count — the
    * fan-in audit that decides which domains need a per-domain cap.
    * One shuffle on the registered domain; map-side partial aggregation.
    */
  def domainStats(docs: DataFrame, urlCol: String): DataFrame =
    urlFlags(docs, urlCol, Nil)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_path")).as("n_paths"))

  /** Canonical URL for exact URL-level dedup — the cheapest dedup in a
    * crawl pipeline (no text needed, run at fetch-list time): lowercased
    * scheme and host, userinfo and scheme-default port (:80 http /
    * :443 https) stripped, fragment dropped, tracking query parameters
    * (utm_*, fbclid, gclid) removed with the remaining parameters kept
    * in their original order, and the bare '?' dropped when nothing
    * survives. Path case and non-default ports are preserved (they are
    * semantic); www-stripping is deliberately NOT done (lossy
    * heuristic). A string with no scheme passes through unchanged.
    * Pure regexp/array expressions — map-only, oracle-portable.
    */
  def canonicalUrl(url: Column): Column = {
    val sch = scheme(url)
    val hostPort = lower(regexp_replace(
      regexp_extract(url, HostRe, 1), "^[^@]*@", ""))
    val h = when(sch === "http", regexp_replace(hostPort, ":80$", ""))
      .when(sch === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val p = path(url)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = array_join(
      filter(split(q, "&"), kv =>
        !kv.rlike("^(?i)(utm_[a-z0-9_]*|fbclid|gclid)=") && kv =!= ""), "&")
    when(sch === "", url).otherwise(
      concat(sch, lit("://"), h, p,
        when(keptParams === "", lit("")).otherwise(concat(lit("?"), keptParams))))
  }

  /** Canonical-URL dedup groups: (canonical_url, n_copies, keep_id) for
    * every URL appearing more than once after canonicalization —
    * min-id survivor, one shuffle on the canonical key. Anti-join the
    * non-survivors out of the fetch list before any byte is fetched.
    */
  def urlDedupGroups(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .filter(col("n_copies") > 1)
}
