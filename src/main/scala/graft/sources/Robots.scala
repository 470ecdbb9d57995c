package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt exclusion engine (RFC 9309, the published Robots
  * Exclusion Protocol) — the crawl-POLITENESS half of the web-curation
  * family: before a 100 TB pipeline fetches, filters, or re-crawls a
  * URL set, it must drop the paths each host's robots.txt excludes for
  * its agent. Format and matching semantics are public spec; original
  * code.
  *
  * Spark-first shape: robots bodies are a DataFrame (host, body) — one
  * row per host, exactly what a frontier crawler has cached. Parsing
  * is declarative line algebra (split + posexplode + window running
  * group ids — the RFC's "group of consecutive user-agent lines
  * followed by rules" becomes a running sum over a lag flag), and the
  * DECISION is a join: urls × the host's applicable rules, longest
  * matching pattern wins, allow on ties (RFC 9309 §2.2.2). Everything
  * narrow until the one host-keyed join; rule tables are KB-sized per
  * host next to URL sets, so the join side broadcasts at real scale
  * while the URL set streams. */
object Robots {

  /** Parse (host, body) robots.txt documents into the flat rule table
    * `(host, group_id, agents: array, rule, pattern, pattern_len)` —
    * one row per allow/disallow line, each carrying ALL the user-agent
    * products of its group (consecutive `User-agent:` lines share the
    * group, RFC 9309 §2.2.1). Comments (#) strip; keys are
    * case-insensitive; non-access-control keys (crawl-delay, sitemap)
    * are ignored; rules before any user-agent line drop (invalid per
    * spec); empty-pattern rules drop (a bare `Disallow:` means
    * allow-all, i.e. no rule). */
  def parseRules(robots: DataFrame, hostCol: String = "host",
                 bodyCol: String = "body"): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("host"), col("ln"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("key"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    // a group STARTS at a user-agent line whose predecessor is not one
    val grouped = lines
      .withColumn("_isUA", (col("key") === "user-agent").cast("int"))
      .withColumn("_starts",
        (col("_isUA") === 1 &&
          coalesce(lag(col("_isUA"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("group_id", sum(col("_starts")).over(w))
      .filter(col("group_id") >= 1)
    val agents = grouped.filter(col("key") === "user-agent")
      .groupBy(col("host"), col("group_id"))
      .agg(collect_set(lower(col("value"))).as("agents"))
    val ruleRows = grouped.filter(col("key") =!= "user-agent" && col("value") =!= "")
      .select(col("host"), col("group_id"), col("key").as("rule"),
        col("value").as("pattern"), octet_length(col("value")).as("pattern_len"))
    // LEFT join: a group with zero rules still EXISTS (one null-rule
    // row) — an exact-agent group that allows everything must still
    // silence the host's * group in [[decide]], per the RFC's
    // group-selection order
    agents.join(ruleRows, Seq("host", "group_id"), "left")
      .select(col("host"), col("group_id"), col("agents"),
        col("rule"), col("pattern"), col("pattern_len"))
  }

  /** The RFC's pattern language compiled to an anchored Java regex:
    * literal octets quoted, `*` → `.*`, one TRAILING `$` → end anchor
    * (a non-trailing `$` is a literal octet, per the spec's examples).
    * This is the reference translation the spec pins; [[decide]]
    * applies the identical translation columnar. */
  private[graft] def patternRegex(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()+-^$|?".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    (if (anchored) sb.append("$") else sb.append(".*")).toString
  }

  /** Columnar twin of [[patternRegex]]: escape every regex
    * metacharacter except `*`, turn `*` into `.*`, then re-interpret
    * exactly one TRAILING (now escaped) `$` as the end anchor. The
    * rule table is host-bounded and tiny — the translation cost is
    * irrelevant; the matching cost is the `regexp_like`. */
  private def regexFromPattern(pattern: Column): Column = {
    val quoted = regexp_replace(pattern, "([\\\\.\\[\\]{}()+\\-^$|?])", "\\\\$1")
    val starred = regexp_replace(quoted, "\\*", ".*")
    when(starred.endsWith("\\$"),
        concat(lit("^"), starred.substr(lit(1), length(starred) - 2), lit("$")))
      .otherwise(concat(lit("^"), starred, lit(".*")))
  }

  /** Access decisions for `urls` (host + path columns) under `rules`
    * (the [[parseRules]] output) for `agent`: the url frame back with
    * `allowed` and the `matched_pattern` that decided (null = no
    * applicable matching rule → allowed, the RFC default; a host with
    * no robots rows allows everything). Group selection per RFC: the
    * groups naming the agent (case-insensitive) if any exist FOR THAT
    * HOST, else that host's `*` groups. Decision per RFC 9309 §2.2.2:
    * among matching rules the LONGEST pattern wins; on a length tie
    * allow beats disallow (least-restrictive). Duplicate url rows keep
    * their multiplicity (decisions key on a per-row uid, not values). */
  def decide(urls: DataFrame, rules: DataFrame, agent: String,
             hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // exact-agent groups beat * groups PER HOST (not globally)
    val exact = rules.filter(array_contains(col("agents"), a))
    val exactHosts = exact.select(col("host")).distinct()
    val star = rules.filter(array_contains(col("agents"), "*"))
      .join(exactHosts, Seq("host"), "left_anti")
    // null-pattern rows exist only to mark group presence (they fed
    // exactHosts above); they never match
    val applicable = exact.unionByName(star)
      .filter(col("pattern").isNotNull)
      .withColumn("_re", regexFromPattern(col("pattern")))
      .select(col("host").as(hostCol), col("rule"), col("pattern"),
        col("pattern_len"), col("_re"))
    val keyed = urls.withColumn("_uid", monotonically_increasing_id())
    val joined = keyed
      .join(applicable, Seq(hostCol), "left")
      .withColumn("_match",
        col("_re").isNotNull && regexp_like(col(pathCol), col("_re")))
    // longest matching pattern wins; allow beats disallow on ties; the
    // trailing pattern key keeps the argmax fully deterministic
    val w = Window.partitionBy(col("_uid"))
      .orderBy(col("_match").desc, col("pattern_len").desc,
        (col("rule") === "allow").desc, col("pattern"))
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(urls.columns.map(col).toSeq ++ Seq(
        (!coalesce(col("_match"), lit(false)) || col("rule") === "allow")
          .as("allowed"),
        when(col("_match"), col("pattern")).otherwise(lit(null).cast("string"))
          .as("matched_pattern")): _*)
  }

  /** Per-host `Crawl-delay` for `agent` → `(host, crawl_delay_sec)`.
    * The directive is non-RFC but universally implemented; it lives
    * INSIDE agent groups, so grouping must run over the full kept line
    * stream (user-agent + rules + crawl-delay — dropping rule lines
    * first would merge adjacent groups), and group selection follows
    * [[decide]]: the host's exact-agent groups if any exist, else its
    * `*` groups. Several applicable values take the MAX (the
    * conservative politeness bound). Hosts without a parseable value
    * are simply absent — the scheduler supplies the default. */
  def crawlDelays(robots: DataFrame, agent: String,
                  hostCol: String = "host", bodyCol: String = "body"): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("host"), col("ln"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("key"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("_isUA", (col("key") === "user-agent").cast("int"))
      .withColumn("_starts",
        (col("_isUA") === 1 &&
          coalesce(lag(col("_isUA"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("group_id", sum(col("_starts")).over(w))
      .filter(col("group_id") >= 1)
    val agents = grouped.filter(col("key") === "user-agent")
      .groupBy(col("host"), col("group_id"))
      .agg(collect_set(lower(col("value"))).as("agents"))
    val delays = grouped
      .filter(col("key") === "crawl-delay" &&
        col("value").rlike("^\\d+(\\.\\d+)?$"))
      .groupBy(col("host"), col("group_id"))
      .agg(max(col("value").cast("double")).as("_delay"))
    // group SELECTION runs over ALL groups, then the directive looks up
    // inside the selected ones — an exact-agent group without a
    // Crawl-delay still silences the host's * group (you never inherit
    // another agent's pacing), exactly like rule selection in [[decide]]
    val exact = agents.filter(array_contains(col("agents"), a))
    val exactHosts = exact.select(col("host")).distinct()
    val star = agents.filter(array_contains(col("agents"), "*"))
      .join(exactHosts, Seq("host"), "left_anti")
    exact.unionByName(star)
      .join(delays, Seq("host", "group_id"))
      .groupBy(col("host"))
      .agg(max(col("_delay")).as("crawl_delay_sec"))
  }

  /** Polite fetch schedule over a seeded frontier: per host, slots
    * assign FIFO by descending priority (ties break on the url — fully
    * deterministic), and each slot waits `crawl_delay_sec` after the
    * previous (hosts without a discovered delay pace at
    * `defaultDelaySec`). One window per host key — politeness is
    * INHERENTLY serial per host, so a giant host's slot numbering
    * costing one partition is the semantics, not a bottleneck to
    * engineer away; across hosts the plan is embarrassingly parallel
    * and the delay table broadcasts. */
  def politeSchedule(frontier: DataFrame, delays: DataFrame,
                     defaultDelaySec: Double = 1.0,
                     hostCol: String = "host", locCol: String = "loc",
                     priorityCol: String = "priority"): DataFrame = {
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priorityCol).desc_nulls_last, col(locCol))
    frontier.join(delays, Seq(hostCol), "left")
      .withColumn("delay_sec",
        coalesce(col("crawl_delay_sec"), lit(defaultDelaySec)))
      .withColumn("slot", row_number().over(w))
      .withColumn("fetch_offset_sec",
        (col("slot") - 1).cast("double") * col("delay_sec"))
      .select(col(hostCol), col(locCol), col("delay_sec"), col("slot"),
        col("fetch_offset_sec"))
  }
}
