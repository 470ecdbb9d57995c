package graft

import graft.operators.WebCurate
import org.apache.spark.sql.functions._

/** URL/domain curation: host grammar corner cases, suffix-chain
  * semantics (no endswith false positives), registrable-domain suffix
  * seam, literal-vs-join blocklist equivalence, and cap determinism. */
class WebCurateSpec extends SparkSpec {
  import spark.implicits._

  private def host1(url: String): String =
    Seq(url).toDF("u").select(WebCurate.hostOf($"u")).as[String].head()

  test("hostOf handles userinfo, ports, www, case, and junk") {
    assert(host1("https://news.example.com/p/1") === "news.example.com")
    assert(host1("https://WWW.Example.COM/p/1") === "example.com")
    assert(host1("http://user:pw@blog.sample.org/x?q=1") === "blog.sample.org")
    assert(host1("https://media.example.com:8080/v#f") === "media.example.com")
    assert(host1("ftp+ssh://a.b.c/d") === "a.b.c")
    assert(host1("not a url") === "", "unparseable -> empty string")
    assert(host1("relative/path") === "")
  }

  test("hostSuffixes is the full dot-chain; blocking has no endswith false positives") {
    val sfx = Seq("news.a.com").toDF("h")
      .select(WebCurate.hostSuffixes($"h")).as[Seq[String]].head()
    assert(sfx === Seq("news.a.com", "a.com", "com"))
    val blocked = Seq(
      "https://badsite.biz/x",          // exact
      "https://spam.badsite.biz/x",     // subdomain
      "https://a.b.badsite.biz/x",      // deep subdomain
      "https://notbadsite.biz/x",       // suffix of the STRING, not the domain
      "https://badsite.biz.evil.com/x"  // blocked name as a LABEL, different domain
    ).toDF("u").select(WebCurate.isBlockedDomain($"u", Seq("badsite.biz")))
      .as[Boolean].collect().toSeq
    assert(blocked === Seq(true, true, true, false, false))
  }

  test("registeredDomainOf: last two labels, with the public-suffix seam") {
    val d = Seq("news.example.com", "example.com", "a.b.co.uk", "b.co.uk")
      .toDF("h")
    assert(d.select(WebCurate.registeredDomainOf($"h")).as[String].collect().toSeq
      === Seq("example.com", "example.com", "co.uk", "co.uk"))
    // with co.uk declared a public suffix, hosts under it keep 3 labels
    assert(d.select(WebCurate.registeredDomainOf($"h", Set("co.uk"))).as[String]
      .collect().toSeq === Seq("example.com", "example.com", "b.co.uk", "b.co.uk"))
  }

  test("literal filter and join filter agree; text never needed for the verdict") {
    val docs = (0L until 64L).map { i =>
      (i, s"https://${Seq("ok.example.com", "spam.badsite.biz", "docs.sample.org",
        "tracker.net")(i.toInt % 4)}/p/$i", s"text $i")
    }.toDF("id", "url", "text")
    val lit = WebCurate.filterByDomain(docs, "url", Seq("badsite.biz", "tracker.net"))
      .select("id").as[Long].collect().sorted
    val blockDf = Seq("badsite.biz", "tracker.net").toDF("blocked_domain")
    val join = WebCurate.filterByDomainJoin(docs, "id", "url", blockDf)
      .select("id").as[Long].collect().sorted
    assert(lit.toSeq === join.toSeq)
    assert(lit.length === 32, "half the residues are blocked")
    assert(lit.forall(i => i % 4 === 0 || i % 4 === 2))
  }

  test("capPerDomain keeps the lowest orderCol per registrable domain") {
    val docs = (0L until 30L).map { i =>
      (i, s"https://${if (i % 3 == 0) "a" else "b"}.example${i % 2}.com/p/$i")
    }.toDF("id", "url")
    val capped = WebCurate.capPerDomain(docs, "url", "id", 3)
    val byDomain = capped
      .withColumn("d", WebCurate.registeredDomainOf(WebCurate.hostOf($"url")))
      .groupBy("d").agg(collect_list("id").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(byDomain.keySet === Set("example0.com", "example1.com"))
    byDomain.values.foreach { ids =>
      assert(ids.length === 3)
    }
    // deterministic: the three smallest ids of each domain survive
    assert(byDomain("example0.com").sorted === Seq(0L, 2L, 4L))
    assert(byDomain("example1.com").sorted === Seq(1L, 3L, 5L))
  }

  test("extractLinks: quote styles, attribute order, case, and junk markup") {
    import graft.operators.WebCurate
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val html =
      """<html><A HREF="http://a.com/x">one</A>
        |<a class='z' href='http://b.com/y?q=1'>two</a>
        |<a name="no-link">three</a>
        |<a href = "https://www.c.co.uk:8080/path#f">four</a>
        |<area href="http://not-an-anchor.com">
        |<a href="">empty</a></html>""".stripMargin
    val out = Seq((1L, html)).toDF("id", "html")
      .select(WebCurate.extractLinks(col("html")).as("l"))
      .as[Seq[String]].head()
    assert(out === Seq("http://a.com/x", "http://b.com/y?q=1",
      "https://www.c.co.uk:8080/path#f", ""))
  }

  test("linkEdges + pageRank: the planted hub out-ranks the satellites") {
    import graft.operators.{GraphRank, WebCurate}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 10 satellite pages all link to hub.com; hub links to s0 only
    val pages = (0 until 10).map { i =>
      (s"http://s$i.com/p", """<a href="http://hub.com/">h</a>""")
    } :+ (("http://hub.com/", """<a href="http://s0.com/a">s</a><a href="http://hub.com/self">self</a>"""))
    val edges = WebCurate.linkEdges(pages.toDF("url", "html"), "url", "html")
    val got = edges.as[(String, String)].collect().toSet
    assert(got.size === 11 && !got.exists(e => e._1 == e._2), "self-loop dropped")
    val pr = GraphRank.pageRank(
      edges.selectExpr("hash(src_host) as src", "hash(dst_host) as dst"),
      "src", "dst", iterations = 20)
      .as[(Long, Double)].collect().toMap
    val hubId = Seq(("hub.com", 1)).toDF("h", "x")
      .selectExpr("hash(h)").as[Long].head()
    assert(pr(hubId) === pr.values.max, "hub must rank first")
  }

  private def canon1(url: String): String =
    Seq(url).toDF("u").select(WebCurate.canonicalizeUrl($"u")).as[String].head()

  test("canonicalizeUrl: case, default ports, fragments, tracking params, param order") {
    // scheme+host lowered, :80 dropped, fragment dropped, utm stripped, params sorted
    assert(canon1("HTTP://WWW.Example.COM:80/Path9?utm_source=f&b=2&a=1#frag")
      === "http://www.example.com/Path9?a=1&b=2")
    // :443 is https-default; trailing-slash path preserved; gclid stripped
    assert(canon1("https://user@Site.org:443/p/1/?gclid=x&z=9&y=8")
      === "https://user@site.org/p/1/?y=8&z=9")
    // non-default port survives; empty path becomes '/'
    assert(canon1("http://host.net:8080?q=7") === "http://host.net:8080/?q=7")
    // bare ref= is content-bearing (VCS branch refs, pagination) and
    // SURVIVES; ref_src and utm_* are tracking and drop
    assert(canon1("HTTPS://Mixed.Com/a?ref=tw&ref_src=x&utm_campaign=c")
      === "https://mixed.com/a?ref=tw")
    // every param is tracking -> query dropped entirely
    assert(canon1("HTTPS://Mixed.Com/a?gclid=1&ref_src=x&utm_campaign=c")
      === "https://mixed.com/a")
    // the ?ref=content false positive: a VCS file URL keeps its branch
    assert(canon1("https://git.example.com/r/blob/f.md?ref=main")
      === "https://git.example.com/r/blob/f.md?ref=main")
    // :80 is NOT ftp's default; path case preserved
    assert(canon1("FTP://Files.example:80/Pub") === "ftp://files.example:80/Pub")
    // 'referrer' is not in the tracking family ('ref' must not prefix-match)
    assert(canon1("http://a.com/x?referrer=me") === "http://a.com/x?referrer=me")
    // the tracking list is a parameter: a crawl that KNOWS bare ref is
    // tracking in its corpus can opt back in
    val refToo = "^(utm_[^=]*|ref|ref_src)(=.*)?$"
    assert(Seq("HTTPS://Mixed.Com/a?ref=tw&ref_src=x").toDF("u")
      .select(WebCurate.canonicalizeUrl($"u", refToo)).as[String].head()
      === "https://mixed.com/a")
    // percent-encoding preserved verbatim
    assert(canon1("http://a.com/a%20b?x=%2F") === "http://a.com/a%20b?x=%2F")
  }

  test("canonicalizeUrl: unparseable input passes through unchanged") {
    for (junk <- Seq("not a url", "relative/path", "", "www.example.com/nope"))
      assert(canon1(junk) === junk)
  }

  test("canonicalizeUrl: IPv6-literal authorities pass through unchanged") {
    // the colon-based host/port split cannot read a bracketed host:
    // rather than mangle ('[' as host, trailing digits as port) and
    // collapse DISTINCT hosts, the URL is preserved verbatim
    val v6 = Seq(
      "http://[::1]:8080/a",
      "http://[2001:db8::1]/x?b=2&a=1",
      "HTTP://[2001:DB8::2]:80/Path#frag",
      "https://user@[::1]/p")
    for (u <- v6) assert(canon1(u) === u)
    // distinct IPv6 hosts stay distinct (the regression the guard fixes)
    assert(canon1("http://[::1]:8080/a") !== canon1("http://[::2]:8080/a"))
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/Path9?utm_source=f&b=2&a=1#frag",
      "https://user@Site.org:443/p/1/?gclid=x&z=9&y=8",
      "http://host.net:8080?q=7", "not a url")
    val once = urls.map(canon1)
    assert(once.map(canon1) === once)
  }
}
