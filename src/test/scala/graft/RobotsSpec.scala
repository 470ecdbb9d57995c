package graft

import graft.sources.Robots
import org.apache.spark.sql.functions._

/** RFC 9309 semantics: group assembly (consecutive UA lines, rules
  * before any group dropped), longest-match decisions, allow-on-tie,
  * `*`/`$` pattern language, exact-agent-beats-star per host, and the
  * allow-by-default edges (no robots, no rules, bare Disallow). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body0 =
    """# politeness file
      |Disallow: /orphan   # before any group: invalid, dropped
      |User-agent: GraftBot
      |Disallow: /private/
      |Allow: /private/open$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin
  private val body1 =
    """User-agent: otherbot
      |user-agent: secondname
      |Disallow: /x*y
      |Disallow:
      |Allow: /p
      |Disallow: /p
      |""".stripMargin

  private def robots = Seq(("a.example", body0), ("b.example", body1))
    .toDF("host", "body")

  private def decisions(agent: String, urls: (String, String)*): Map[String, (Boolean, String)] =
    Robots.decide(urls.toDF("host", "path"), Robots.parseRules(robots), agent)
      .collect()
      .map(r => r.getString(1) -> ((r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap

  test("parseRules: groups, comments, invalid leading rules, empty patterns") {
    val rules = Robots.parseRules(robots).collect()
    // /orphan dropped (before any UA), bare Disallow dropped
    assert(!rules.exists(_.getString(4) == "/orphan"))
    assert(rules.count(_.getString(0) == "a.example") === 3)
    // consecutive UA lines share one group
    val shared = rules.filter(r => r.getString(0) == "b.example" && r.getString(4) == "/x*y")
    assert(shared.length === 1)
    assert(shared(0).getSeq[String](2).toSet === Set("otherbot", "secondname"))
  }

  test("decide: longest match wins, $ anchors, allow-on-tie, star fallback, defaults") {
    val d = decisions("graftbot",
      ("a.example", "/public"), ("a.example", "/private/a"),
      ("a.example", "/private/open"), ("a.example", "/private/openx"),
      ("c.example", "/anything"))
    assert(d("/public") === ((true, null)))                       // no matching rule
    assert(d("/private/a") === ((false, "/private/")))            // disallowed
    assert(d("/private/open") === ((true, "/private/open$")))     // $ anchor + longer
    assert(d("/private/openx") === ((false, "/private/")))        // anchor fails
    assert(d("/anything") === ((true, null)))                     // host without robots
    // an agent with no exact group falls back to THAT host's * group
    val s = decisions("randombot", ("a.example", "/public"), ("b.example", "/q"))
    assert(s("/public") === ((false, "/")))
    assert(s("/q") === ((true, null))) // b.example has no * group
    // an exact group with ZERO rules still SILENCES the star group
    // (RFC group selection: the matched group's rules apply, even when
    // that set is empty — everything allowed, never the * fallback)
    val emptyGroup = Seq(("e.example",
      "User-agent: GraftBot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"))
      .toDF("host", "body")
    val eg = Robots.decide(Seq(("e.example", "/q")).toDF("host", "path"),
      Robots.parseRules(emptyGroup), "graftbot").collect()(0)
    assert(eg.getBoolean(2) === true && eg.isNullAt(3))
    // wildcard patterns + allow-on-tie for the shared-agent group
    val o = decisions("SECONDNAME",
      ("b.example", "/xabcy"), ("b.example", "/xy"), ("b.example", "/x"),
      ("b.example", "/p"), ("b.example", "/pq"))
    assert(o("/xabcy") === ((false, "/x*y")))
    assert(o("/xy") === ((false, "/x*y")))
    assert(o("/x") === ((true, null)))
    assert(o("/p") === ((true, "/p")))   // same-length allow beats disallow
    assert(o("/pq") === ((true, "/p")))
  }

  test("decide preserves duplicate url rows and input columns") {
    val urls = Seq(("a.example", "/private/a", 7), ("a.example", "/private/a", 8))
      .toDF("host", "path", "tag")
    val got = Robots.decide(urls, Robots.parseRules(robots), "graftbot")
      .orderBy("tag").collect()
    assert(got.length === 2 && got.map(_.getInt(2)).toSeq === Seq(7, 8))
    assert(got.forall(!_.getBoolean(3)))
  }

  test("patternRegex: the reference translation") {
    assert(Robots.patternRegex("/a*b$") === "^/a.*b$")
    assert(Robots.patternRegex("/plain") === "^/plain.*")
    assert("/a$b".matches(Robots.patternRegex("/a$b").dropRight(2) + ".*") === true)
    // non-trailing $ is literal: "/a$b" must match itself, not anchor
    assert("/a$bc".matches(Robots.patternRegex("/a$b")))
    assert(!"/aXb".matches(Robots.patternRegex("/a$b")))
    // regex metacharacters in paths are literal octets
    assert("/p.q".matches(Robots.patternRegex("/p.q")))
    assert(!"/pXq".matches(Robots.patternRegex("/p.q")))
  }

  test("crawlDelays: inside-group extraction, group-merge hazard, selection, max") {
    val robots = Seq(
      // UA line AFTER rule lines must START a new group — if rule lines
      // dropped before grouping, the * group would merge into GraftBot's
      ("a.test", "User-agent: GraftBot\nDisallow: /x\nCrawl-delay: 2\n" +
        "User-agent: *\nCrawl-delay: 60\n"),
      // star-only host
      ("b.test", "User-agent: *\nDisallow:\nCrawl-delay: 7.5\n"),
      // several applicable values -> MAX; non-numeric ignored
      ("c.test", "User-agent: GraftBot\nCrawl-delay: 3\nCrawl-delay: 9\n" +
        "Crawl-delay: soon\n"),
      // no delay anywhere -> absent row
      ("d.test", "User-agent: *\nDisallow: /\n"),
      // exact group WITHOUT a delay still silences *: selection is by
      // group, then the directive reads from the selected group only —
      // an agent never inherits another agent's pacing -> absent
      ("e.test", "User-agent: GraftBot\nDisallow: /x\n" +
        "User-agent: *\nCrawl-delay: 60\n"))
      .toDF("host", "body")
    val got = Robots.crawlDelays(robots, "GraftBot").orderBy("host")
      .as[(String, Double)].collect().toSeq
    assert(got === Seq(("a.test", 2.0), ("b.test", 7.5), ("c.test", 9.0)))
  }

  test("politeSchedule: priority order, per-host offsets, default delay, tie-break") {
    val frontier = Seq(
      ("a.test", "https://a.test/p1", 0.5),
      ("a.test", "https://a.test/p2", 0.9),
      ("a.test", "https://a.test/p0", 0.5), // ties with p1 -> loc order
      ("b.test", "https://b.test/q", 0.1))
      .toDF("host", "loc", "priority")
    val delays = Seq(("a.test", 2.0)).toDF("host", "crawl_delay_sec")
    val got = Robots.politeSchedule(frontier, delays, defaultDelaySec = 5.0)
      .orderBy("host", "slot")
      .as[(String, String, Double, Int, Double)].collect().toSeq
    assert(got === Seq(
      ("a.test", "https://a.test/p2", 2.0, 1, 0.0),
      ("a.test", "https://a.test/p0", 2.0, 2, 2.0),
      ("a.test", "https://a.test/p1", 2.0, 3, 4.0),
      ("b.test", "https://b.test/q", 5.0, 1, 0.0)))
  }
}
