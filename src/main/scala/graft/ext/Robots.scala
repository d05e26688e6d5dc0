package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation — the crawl-politeness gate between frontier
  * discovery and fetching: no URL the frontier surfaces may be fetched
  * against the host's published rules. Reduced to the deterministic core of
  * the Google robots.txt spec (RFC 9309):
  *
  *  - group selection: the group whose `User-agent:` line matches the
  *    caller's agent token (case-insensitive, whole-line; multi-token
  *    groups bind to every listed token, a matched-but-empty group means
  *    allow-all — see [[agentSection]]), falling back to the
  *    `User-agent: *` group only when the file has NO group for the token;
  *    star is also the default when no agent is passed (the
  *    corpus-wide-audit view),
  *  - `Allow:` / `Disallow:` rules are PATH PREFIXES, with RFC 9309's two
  *    special characters honored: `*` matches any character run (including
  *    `/`) and a TRAILING `$` anchors the end of the path; an interior `$`
  *    is a literal, like Google's parser treats it,
  *  - decision = the LONGEST matching rule wins (rule length = octets of
  *    the rule path as written, wildcards included — the RFC's
  *    most-specific measure); on equal length `Allow` wins; no matching
  *    rule (or no robots.txt for the host) = allowed,
  *  - an empty-path `Disallow:` means "no restriction" per the spec and is
  *    dropped at parse time,
  *  - matching is CASE-INSENSITIVE on both sides — a deliberate deviation
  *    from RFC 9309's case-sensitive path matching, documented here: the
  *    URL side derives from [[Url.canonicalKey]], which lowercases, so a
  *    mixed-case rule (`Disallow: /Admin`) matched case-sensitively would
  *    silently never fire and the politeness gate would fail OPEN — the
  *    unsafe direction for a crawl gate. Folding the rule side too trades
  *    a little over-blocking (rare case-distinct paths) for never
  *    under-blocking on the common mixed-case-rule corpus.
  *
  * Everything is regexp/when column work in the RE2/Java common subset
  * (`(?is)`/`(?im)` flags, non-greedy, NO lookaround — RE2 has none), so
  * the DuckDB oracle replays it verbatim — including the wildcard-rule →
  * regex translation, which stays in the shared subset (escaped literals,
  * `.*`, `^`/`$` anchors). Scale shape: rules explode to (host, verb,
  * path) — a few rows per host, NOT per URL — fold to ONE sorted
  * struct-array row per host, and the decision is one broadcast equi-join
  * on host + a per-row array probe; the URL side is never exchanged.
  */
object Robots {

  /** The run of lines a group body may begin with before its first rule:
    * FURTHER `User-agent:` lines (a multi-token group — several consecutive
    * tokens sharing one rule block, RFC 9309 §2.1's group-of-lines form),
    * blank lines AND `#` comment lines (the RFC parses groups over
    * significant lines only, so neither ends a group —
    * `User-agent: a\n# ours\nUser-agent: b` is still ONE two-token
    * group; the comment alternative is an r15-review fix, same
    * fail-open class as the blank-line case). Skipping this run after the
    * matched token's own line attributes the shared rule block to EVERY
    * listed token, not just the last (the pre-r15 reduction that failed
    * open for the earlier tokens of `User-agent: a\nUser-agent: b\n
    * Disallow: /`). Each iteration consumes a newline, so the scan is
    * linear; the whole pattern stays in the RE2/Java common subset (no
    * lookaround). */
  private val UaSkip =
    "(?:[ \\t]*(?:user-agent:[^\\n]*|#[^\\n]*)?\\r?\\n)*"

  /** End of a matched `User-agent:` line: optional trailing whitespace and
    * an optional EOL `#` comment (RFC 9309 permits comments anywhere; the
    * r15 strict-terminator form rejected `User-agent: * # all crawlers`,
    * which made the whole group VANISH — the gate failing open). */
  private val UaEol = "[ \\t]*(?:#[^\\n]*)?\\r?\\n"

  /** The `User-agent: *` group's body (text until the next `User-agent:`
    * or end-of-file, after the [[UaSkip]] run of co-listed tokens / blank
    * lines). Non-greedy + alternation terminator instead of a lookahead
    * (RE2 has none). Empty string when the file has no star group — every
    * rule extractor then yields zero rules = allow-all. */
  def starSection(robotsTxt: Column): Column =
    regexp_extract(robotsTxt,
      "(?is)user-agent:[ \\t]*\\*" + UaEol + UaSkip +
        "(.*?)(?:user-agent:|$)", 1)

  /** The group body for a SPECIFIC agent token — RFC 9309's group
    * selection: the token must match a whole `User-agent:` line (so
    * `graftbot` never matches a `graftbot-pro` group — the line-end anchor
    * is the token boundary, since RE2 has no lookahead), matching is
    * case-insensitive, and a multi-token group attributes its shared rule
    * block to EVERY listed token ([[UaSkip]] — the earlier tokens' matches
    * skip the remaining `User-agent:`/blank lines to the block).
    *
    * Fallback is decided on group PRESENCE, not body emptiness: a file
    * that lists the token but gives its group no rules (`User-agent:
    * graftbot` as the last line, or followed only by another group) means
    * allow-EVERYTHING for that agent per the RFC — it must NOT inherit the
    * star group (the pre-r15 behavior over-blocked exactly that form).
    * Only a file with no group for the token at all falls back to star.
    * When the token appears in several groups, the FIRST wins (documented
    * reduction; the RFC's union-merge is rare in real corpora). `agent`
    * must be a plain token (letters/digits/`-`/`_`) — it is embedded in a
    * regex both engines replay. */
  def agentSection(robotsTxt: Column, agent: String): Column = {
    require(agent.matches("[A-Za-z0-9_-]+"),
      s"agent must be a plain robots token, got '$agent'")
    val present = robotsTxt.rlike(
      "(?im)^[ \\t]*user-agent:[ \\t]*" + agent.toLowerCase +
        "[ \\t]*(?:#[^\\n]*)?\\r?$")
    val own = regexp_extract(robotsTxt,
      "(?is)user-agent:[ \\t]*" + agent.toLowerCase +
        UaEol + UaSkip + "(.*?)(?:user-agent:|$)", 1)
    when(present, own).otherwise(starSection(robotsTxt))
  }

  private val RulePat = "(?im)^[ \\t]*(allow|disallow)[ \\t]*:[ \\t]*(\\S*)"

  /** (host, verb, path) rule table from a (hostCol, robotsCol) frame: the
    * star group's Allow/Disallow lines, verbs AND paths lowercased (the
    * case-insensitive deviation documented on the object), empty-path rules
    * dropped (spec: no restriction). The two regexp_extract_all calls share
    * ONE pattern, so their leftmost-first match orders align and arrays_zip
    * pairs verb i with path i — the same trick both engines agree on. */
  def rules(robots: DataFrame, hostCol: String, robotsCol: String,
            agent: String = "*"): DataFrame = {
    val sec = if (agent == "*") starSection(col(robotsCol))
      else agentSection(col(robotsCol), agent)
    robots.select(col(hostCol).as("host"),
        regexp_extract_all(sec, lit(RulePat), lit(1)).as("__v"),
        regexp_extract_all(sec, lit(RulePat), lit(2)).as("__p"))
      .select(col("host"), explode(arrays_zip(col("__v"), col("__p"))).as("__r"))
      .select(col("host"),
        lower(col("__r.__v")).as("verb"), lower(col("__r.__p")).as("path"))
      .filter(col("path") =!= "")
  }

  /** A rule path translated to its anchored match regex, NULL for plain
    * prefix rules (no `*`, no trailing `$`) — those take the cheap
    * `startsWith` route in [[decide]] and skip per-row regex compilation.
    * Translation: strip one trailing `$` (remembering it as an end anchor),
    * backslash-escape every regex special EXCEPT `*`, then `*` -> `.*`;
    * result = `^` + body (+ `$`). Interior `$` becomes a literal via the
    * escape pass. Every piece is RE2/Java-common so the oracle twins the
    * translation character for character. */
  private[ext] def rulePattern(path: Column): Column = {
    val hasEnd = path.endsWith("$")
    val core = when(hasEnd, regexp_replace(path, "\\$$", "")).otherwise(path)
    val esc = regexp_replace(core, "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    val body = regexp_replace(esc, "\\*", ".*")
    val pat = concat(lit("^"), body, when(hasEnd, lit("$")).otherwise(lit("")))
    when(path.contains("*") || hasEnd, pat).otherwise(lit(null).cast("string"))
  }

  /** Per-host `Crawl-delay` (seconds, DOUBLE; NULL when the selected group
    * publishes none) — the de-facto politeness-rate directive (not in
    * RFC 9309 but ubiquitous in real robots.txt and honored by most
    * non-Google crawlers). First declaration in the group wins.
    * CONSUMED by [[Crawl.frontierOrder]] (`windowSec > 0`): the scheduler
    * quota is floor(window / delay) fetches per host per scheduling
    * window — the per-host refinement of the per-domain cap, applied
    * before it so a quota victim frees its domain slot. */
  def crawlDelay(robots: DataFrame, hostCol: String, robotsCol: String,
                 agent: String = "*"): DataFrame = {
    val sec = if (agent == "*") starSection(col(robotsCol))
      else agentSection(col(robotsCol), agent)
    robots.select(col(hostCol).as("host"),
      nullif(regexp_extract(sec,
        "(?im)^[ \\t]*crawl-delay[ \\t]*:[ \\t]*([0-9]+(?:\\.[0-9]+)?)", 1),
        lit("")).cast("double").as("crawl_delay_s"))
  }

  /** The `Sitemap:` directives — per the sitemaps.org robots extension the
    * field is FILE-WIDE, not group-scoped (a `Sitemap:` line inside any
    * agent group still applies to every crawler), so this extracts ALL
    * occurrences from the whole file, unlike every group-scoped reader
    * above. One row per (host, directive), in file order (`sm_pos`
    * 1-based); values trim but are otherwise passed through verbatim — the
    * spec requires absolute URLs, and the fetcher that consumes this is
    * the right place to reject relative ones. EOL `#` comments are cut
    * (the URL grammar has no raw `#` — fragments are not sent to servers
    * and [[Url.canonicalKey]] strips them anyway). Hosts whose file
    * publishes no directive yield no rows.
    *
    * This is the discovery edge that CLOSES the sitemap loop: robots.txt
    * names the sitemap URLs, a fetch pass retrieves them, and
    * [[Url.sitemapEntries]] → [[Url.discoveredWithSitemaps]] feed the
    * frontier. Zero shuffle — one regexp_extract_all + posexplode per
    * robots row. */
  def sitemapUrls(robots: DataFrame, hostCol: String,
                  robotsCol: String): DataFrame =
    robots.select(col(hostCol).as("host"),
        posexplode(regexp_extract_all(col(robotsCol),
          lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^\\r\\n#]+)"), lit(1)))
          .as(Seq("__sm_pos", "__sm_url")))
      .select(col("host"), (col("__sm_pos") + 1).cast("long").as("sm_pos"),
        trim(col("__sm_url")).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Per-URL allow/deny decision. `urls` rows keep all their columns and
    * gain `allowed`; the URL's host/path derive from [[Url.canonicalKey]]
    * so rule matching shares the family's port-proof, lowercased regime.
    * Path = everything from the first `/` of the canonical key (query
    * string included, `&`-normalized — robots prefixes almost never reach
    * into queries; documented).
    *
    * Shape: rules fold to ONE row per host — a sorted struct array
    * (-pathLen, verb, path, pattern), ascending sort = longest rule first
    * with `allow` before `disallow` on equal length, so the precedence
    * order IS the array order and the decision is "first matching element".
    * Wildcard-bearing rules carry their translated regex in `pattern` and
    * match via `regexp_like` (column-pattern regex — compiled per probe,
    * paid only by the wildcard minority); plain rules keep the
    * `startsWith` fast path. The per-host table is tiny (a few rules per
    * host that publishes any), so the join broadcasts under AQE and the
    * URL side is never exchanged; internal scratch columns use reserved
    * `__robots`-prefixed names so a user frame already carrying `host`
    * (common for crawl tables) joins without ambiguity. */
  def decide(urls: DataFrame, urlCol: String,
             robots: DataFrame, hostCol: String, robotsCol: String,
             agent: String = "*"): DataFrame = {
    val key = Url.canonicalKey(col(urlCol))
    val perHost = rules(robots, hostCol, robotsCol, agent)
      .groupBy("host")
      .agg(sort_array(collect_list(struct(
        (-length(col("path"))).as("nl"),
        col("verb").as("verb"),
        col("path").as("path"),
        rulePattern(col("path")).as("pattern")))).as("__robots_rules"))
      .withColumnRenamed("host", "__robots_host")
    // root URLs: canonicalKey strips the trailing '/', so a bare homepage
    // key has NO '/...' tail and the extracted path is '' — which no rule
    // (not even 'Disallow: /') can match: the gate would fail OPEN on
    // exactly the deny-all form. Empty path folds to '/' (the path the
    // fetcher actually requests); a query-only root key ('example.com&x=1')
    // folds to '/' too, consistent with the documented
    // rules-rarely-reach-into-queries approximation.
    urls.withColumn("__robots_h", Url.hostOf(key))
      .withColumn("__robots_p",
        coalesce(nullif(regexp_extract(key, "(/.*)$", 1), lit("")), lit("/")))
      .join(perHost, col("__robots_h") === col("__robots_host"), "left")
      .withColumn("__robots_hits", filter(col("__robots_rules"),
        r => when(r.getField("pattern").isNull,
            col("__robots_p").startsWith(r.getField("path")))
          .otherwise(regexp_like(col("__robots_p"), r.getField("pattern")))))
      .withColumn("allowed",
        col("__robots_hits").isNull || size(col("__robots_hits")) === 0 ||
          element_at(col("__robots_hits"), 1).getField("verb") === "allow")
      .drop("__robots_host", "__robots_h", "__robots_p",
        "__robots_rules", "__robots_hits")
  }
}
