package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level curation (the RefinedWeb/CCNet playbook: Penedo et
  * al. 2023 §3.1): crawl curation starts at the URL, not the text —
  * extract the host, drop blocklisted domains (with their subdomains),
  * and cap how many documents any one domain may contribute so a single
  * crawl-heavy site can't dominate the mixture.
  *
  * Everything here is Column-algebra over built-in functions (regex,
  * arrays, windows) — no UDFs, fully codegen'd, and the host grammar is
  * ONE regex string shared verbatim with the DuckDB oracle twin.
  *
  * Scale design:
  *  - host/domain extraction is narrow (per-row regex);
  *  - blocklist filtering is a hash ANTI-JOIN on the host's suffix
  *    chain (`news.a.com -> [news.a.com, a.com, com]`), exploded at
  *    most `hostname labels` (~4-5) rows per doc — subdomain matching
  *    WITHOUT a like/endswith predicate, so Spark plans a broadcast (or
  *    shuffled, for million-entry lists) hash join, never a nested loop;
  *  - per-domain caps are a rank-per-key window, which the engine's
  *    TopKPerKey rewrite plans as a bounded heap per domain rather than
  *    a full sort when a cap literal is present.
  */
object WebCurate {

  /** Host grammar, shared VERBATIM with the DuckDB twins: scheme, then
    * optional userinfo@, capture up to the first of [:/?#]. Applied
    * under lower() with a leading `www.` strip. */
  val HostRegex: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  /** Hostname of a URL: lowercased, port/userinfo dropped, leading
    * `www.` stripped. Unparseable URLs yield the empty string (regex
    * no-match) — filter or fail on that downstream as policy dictates. */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRegex, 1)), "^www\\.", "")

  /** Naive registrable domain: the last two labels (`a.b.c -> b.c`).
    * Production code layers a public-suffix list on top — pass the
    * multi-label suffixes you care about (e.g. "co.uk") in
    * `twoLevelSuffixes` and hosts under them keep three labels. The
    * default (empty) is exactly SQL-expressible for the oracle. */
  def registeredDomainOf(host: Column,
                         twoLevelSuffixes: Set[String] = Set.empty): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, greatest(n - 1, lit(1)), lit(2)), ".")
    val lastThree = array_join(slice(labels, greatest(n - 2, lit(1)), lit(3)), ".")
    if (twoLevelSuffixes.isEmpty) lastTwo
    else when(lastTwo.isin(twoLevelSuffixes.toSeq: _*) && n >= lit(3), lastThree)
      .otherwise(lastTwo)
  }

  /** The host's dot-suffix chain: `news.a.com -> [news.a.com, a.com,
    * com]` — the join key set that makes subdomain blocklisting a hash
    * join instead of an endswith scan. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** True when the URL's host is a blocklisted domain or any subdomain
    * of one — a NARROW predicate (suffix chain vs literal array), zero
    * joins, for the common case of an in-memory blocklist. */
  def isBlockedDomain(url: Column, blocklist: Seq[String]): Column =
    arrays_overlap(hostSuffixes(hostOf(url)),
      array(blocklist.map(d => lit(d.toLowerCase)): _*))

  /** Drop rows whose host matches `blocklist` (domains + subdomains).
    * Literal-predicate path: one narrow scan, no shuffle. Right for
    * blocklists that fit comfortably in the plan (up to ~thousands). */
  def filterByDomain(df: DataFrame, urlCol: String,
                     blocklist: Seq[String]): DataFrame =
    df.where(!isBlockedDomain(col(urlCol), blocklist))

  /** Million-entry-blocklist path: `blockDf(blocked_domain)` is a
    * TABLE. The suffix chain explodes on a NARROW (id, suffix)
    * projection only — the semi-join finds blocked ids, the anti-join
    * removes them from the full rows. Both are equality hash joins
    * (broadcast when small, shuffled when not); document text never
    * rides a shuffle. */
  def filterByDomainJoin(df: DataFrame, idCol: String, urlCol: String,
                         blockDf: DataFrame): DataFrame = {
    val blockedIds = df
      .select(col(idCol), explode(hostSuffixes(hostOf(col(urlCol)))).as("_sfx"))
      .join(blockDf, col("_sfx") === lower(blockDf.col(blockDf.columns.head)), "left_semi")
      .select(idCol).distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Anchor grammar, shared with the oracle twins: an `<a ...>` tag's
    * href attribute value, double- or single-quoted. Deliberately a
    * grammar over the ATTRIBUTE (not a full HTML parse): crawl-scale
    * link extraction wants one codegen'd regex pass per document, and
    * malformed markup yields fewer links, never a crash. */
  val HrefRegex: String = "(?i)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']"

  /** All outgoing link targets of an HTML document, in document order
    * (array<string>) — one narrow regexp pass. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(HrefRegex), lit(1))

  /** Host-level link edges (src_host, dst_host) from (url, html) rows —
    * the input [[GraphRank.pageRank]] ranks: extract → host-normalize →
    * drop self-loops and unparseable hosts → distinct. All narrow until
    * the final distinct (one shuffle on the edge pair). */
  def linkEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(hostOf(col(urlCol)).as("src_host"),
        explode(extractLinks(col(htmlCol))).as("_href"))
      .select(col("src_host"), hostOf(col("_href")).as("dst_host"))
      .where(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .distinct()

  /** Keep at most `maxPerDomain` docs per registrable domain, lowest
    * `orderCol` first (deterministic) — the "no single site dominates"
    * cap. Plans as rank-per-key; the TopKPerKey rewrite bounds it. */
  def capPerDomain(df: DataFrame, urlCol: String, orderCol: String,
                   maxPerDomain: Int,
                   twoLevelSuffixes: Set[String] = Set.empty): DataFrame = {
    require(maxPerDomain > 0, "maxPerDomain must be > 0")
    val domain = registeredDomainOf(hostOf(col(urlCol)), twoLevelSuffixes)
    df.withColumn("_domain", domain)
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col("_domain"))
          .orderBy(col(orderCol).asc)))
      .where(col("_rk") <= maxPerDomain)
      .drop("_domain", "_rk")
  }

  /** Tracking query parameters dropped by [[canonicalizeUrl]] — the
    * click-attribution families every published URL normalizer strips
    * (utm_*, ad-click ids, social share refs). Shared VERBATIM with the
    * DuckDB twin; matches the whole `key=value` token (or a bare key).
    * Bare `ref` is deliberately NOT in the default list: it is
    * content-bearing on many sites (VCS `?ref=branch`, pagination
    * refs), so stripping it would alias distinct pages; crawls that
    * know their corpus can pass a tuned list to [[canonicalizeUrl]]. */
  val TrackingParamRegex: String =
    "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|yclid|ref_src)(=.*)?$"

  /** Canonical URL form for crawl-frontier/corpus dedup (the
    * standard normalizations of RFC 3986 §6.2 plus tracking-param
    * removal): lowercase scheme and host, drop the scheme's default
    * port (80/443), drop the fragment, empty path becomes "/", strip
    * [[TrackingParamRegex]] query params and byte-sort the survivors
    * (`a=1&b=2` == `b=2&a=1`). Userinfo and percent-encoding are
    * preserved verbatim (decoding can change semantics). A string the
    * scheme grammar can't parse is returned UNCHANGED — canonicalization
    * must never destroy a key it cannot read. IPv6-literal authorities
    * (`http://[::1]:8080/…`) also pass through unchanged for the same
    * reason: the colon-based host/port split cannot read a bracketed
    * host, and a mangled canonical form would wrongly collapse distinct
    * hosts (they stay distinct verbatim — IPv6 literals are rare enough
    * in crawl frontiers that losing their case/port folding is the safe
    * trade).
    *
    * `trackingParamRegex` defaults to [[TrackingParamRegex]]; crawls
    * whose corpus uses a stripped key as content (or needs more keys
    * stripped) pass their own list.
    *
    * Scale shape: one narrow per-row projection — regex splits plus one
    * array filter/sort over the handful of query params (the lambda is
    * per-row-once and non-generator, the sanctioned HOF position). The
    * whole grammar is regex-expressible so the DuckDB twin reruns it
    * verbatim. */
  def canonicalizeUrl(url: Column,
                      trackingParamRegex: String = TrackingParamRegex): Column = {
    val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val auth = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val userinfo = regexp_extract(auth, "^([^@]*@)", 1)
    val hostPort = regexp_replace(auth, "^[^@]*@", "")
    val host = lower(regexp_extract(hostPort, "^([^:]+)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portOut = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val path0 = regexp_extract(rest, "^([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "^[^?#]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamRegex))
    val qOut = array_join(array_sort(params), "&")
    val canon = concat(scheme, lit("://"), userinfo, host, portOut, path,
      when(qOut === "", lit("")).otherwise(concat(lit("?"), qOut)))
    when(regexp_extract(url, schemeRe, 1) === "" ||
      substring(hostPort, 1, 1) === "[", url).otherwise(canon)
  }
}
