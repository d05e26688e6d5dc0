package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation — the crawl-politeness gate between frontier
  * discovery and fetching: no URL the frontier surfaces may be fetched
  * against the host's published rules. Reduced to the deterministic core of
  * the Google robots.txt spec (RFC 9309):
  *
  *  - only the `User-agent: *` group is honored (a real crawler would first
  *    look for its own token; the fallback group is the part every engine
  *    agrees on and the one a corpus-wide audit wants),
  *  - `Allow:` / `Disallow:` rules are PATH PREFIXES; `*`/`$` wildcards are
  *    NOT interpreted (documented: a wildcard rule simply never matches,
  *    because a literal `*` cannot prefix a real path),
  *  - decision = the LONGEST matching rule wins; on equal length `Allow`
  *    wins; no matching rule (or no robots.txt for the host) = allowed,
  *  - an empty-path `Disallow:` means "no restriction" per the spec and is
  *    dropped at parse time.
  *
  * Everything is regexp/when column work in the RE2/Java common subset
  * (`(?is)`/`(?im)` flags, non-greedy, NO lookaround — RE2 has none), so
  * the DuckDB oracle replays it verbatim. Scale shape: rules explode to
  * (host, verb, path) — a few rows per host, NOT per URL — and the
  * decision is one equi-join on host + one window over the matched rules;
  * the URL side is never exchanged twice.
  */
object Robots {

  /** The `User-agent: *` group's body (text until the next `User-agent:`
    * or end-of-file). Non-greedy + alternation terminator instead of a
    * lookahead (RE2 has none). Empty string when the file has no star
    * group — every rule extractor then yields zero rules = allow-all. */
  def starSection(robotsTxt: Column): Column =
    regexp_extract(robotsTxt,
      "(?is)user-agent:\\s*\\*\\s*(.*?)(?:user-agent:|$)", 1)

  private val RulePat = "(?im)^[ \\t]*(allow|disallow)[ \\t]*:[ \\t]*(\\S*)"

  /** (host, verb, path) rule table from a (hostCol, robotsCol) frame: the
    * star group's Allow/Disallow lines, verbs lowercased, empty-path rules
    * dropped (spec: no restriction). The two regexp_extract_all calls share
    * ONE pattern, so their leftmost-first match orders align and arrays_zip
    * pairs verb i with path i — the same trick both engines agree on. */
  def rules(robots: DataFrame, hostCol: String, robotsCol: String): DataFrame = {
    val sec = starSection(col(robotsCol))
    robots.select(col(hostCol).as("host"),
        regexp_extract_all(sec, lit(RulePat), lit(1)).as("__v"),
        regexp_extract_all(sec, lit(RulePat), lit(2)).as("__p"))
      .select(col("host"), explode(arrays_zip(col("__v"), col("__p"))).as("__r"))
      .select(col("host"),
        lower(col("__r.__v")).as("verb"), col("__r.__p").as("path"))
      .filter(col("path") =!= "")
  }

  /** Per-URL allow/deny decision. `urls` rows keep all their columns and
    * gain `allowed`; the URL's host/path derive from [[Url.canonicalKey]]
    * so rule matching is as port/case-proof as the rest of the family.
    * Path = everything from the first `/` of the canonical key (query
    * string included, `&`-normalized — robots prefixes almost never reach
    * into queries; documented).
    *
    * Shape: rules fold to ONE row per host — a sorted struct array
    * (-pathLen, verb, path), ascending sort = longest rule first with
    * `allow` before `disallow` on equal length, so the precedence order IS
    * the array order and the decision is "first matching element". The
    * per-host table is tiny (a few rules per host that publishes any), so
    * the join broadcasts under AQE and the URL side is never exchanged;
    * the match itself is a per-row array filter. A join+window over the
    * fanned-out (url x rule) pairs would shuffle the corpus instead. */
  def decide(urls: DataFrame, urlCol: String,
             robots: DataFrame, hostCol: String, robotsCol: String): DataFrame = {
    val key = Url.canonicalKey(col(urlCol))
    val perHost = rules(robots, hostCol, robotsCol)
      .groupBy("host")
      .agg(sort_array(collect_list(struct(
        (-length(col("path"))).as("nl"),
        col("verb").as("verb"),
        col("path").as("path")))).as("__rules"))
    urls.withColumn("__host", Url.hostOf(key))
      .withColumn("__path", regexp_extract(key, "(/.*)$", 1))
      .join(perHost, col("__host") === col("host"), "left")
      .withColumn("__hits", filter(col("__rules"),
        r => col("__path").startsWith(r.getField("path"))))
      .withColumn("allowed",
        col("__hits").isNull || size(col("__hits")) === 0 ||
          element_at(col("__hits"), 1).getField("verb") === "allow")
      .drop("host", "__host", "__path", "__rules", "__hits")
  }
}
